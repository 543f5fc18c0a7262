package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Trigger rules and the notification store: threshold rules evaluated
  * over KPI data per granularity period; exceedances become append-only
  * notification records — the reference's trigger/notification machinery.
  */
object Triggers {

  /** A threshold rule over one KPI column. `predicate` receives the KPI
    * column and returns the exceedance condition. */
  final case class Rule(name: String, kpi: String, severity: String)(
      val predicate: Column => Column)

  /** Evaluate rules over a KPI DataFrame (entity_id, ts, kpi columns...).
    * Each rule contributes its exceedance rows; the result is the
    * notification shape (entity_id, ts, rule, severity, kpi, value).
    * Pure narrow filters — no shuffle beyond the union. */
  def evaluate(kpis: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.map { r =>
      kpis.where(r.predicate(col(r.kpi)))
        .select(col("entity_id"), col("ts"),
          lit(r.name).as("rule"), lit(r.severity).as("severity"),
          lit(r.kpi).as("kpi"), col(r.kpi).cast("double").as("value"))
    }.reduce(_ unionByName _)

  /** Append notifications to the store (append-only, day-partitioned). */
  def store(notifications: DataFrame, dir: String): Unit =
    notifications
      .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Append).partitionBy("d").parquet(dir)
}
