package graft.directory

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Relation directory: named entity-to-entity mappings (Cell→Site,
  * customer→nation…) defined by a rule over the entity registry / source
  * data and refreshed materialized-view-style — the reference's
  * relation_directory. A relation is a two-column table
  * (source_id, target_id); hierarchy rollups broadcast it
  * (TrendStore.aggregateEntity).
  */
object Relations {

  /** Materialize (or refresh) a relation under `rootDir/name` from its
    * defining rule. Overwrite semantics = the reference's full refresh;
    * the write is tiny (relations are dimension-sized). */
  def refresh(spark: SparkSession, rootDir: String, name: String)
             (rule: => DataFrame): DataFrame = {
    val rel = rule.select(col("source_id"), col("target_id")).distinct()
    rel.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$rootDir/$name")
    spark.read.parquet(s"$rootDir/$name")
  }

  def load(spark: SparkSession, rootDir: String, name: String): DataFrame =
    spark.read.parquet(s"$rootDir/$name")

  /** Compose two relations (a→b, b→c ⇒ a→c): multi-level hierarchy in one
    * broadcast-sized join. */
  def compose(ab: DataFrame, bc: DataFrame): DataFrame =
    ab.select(col("source_id"), col("target_id").as("mid"))
      .join(bc.select(col("source_id").as("mid2"), col("target_id")),
        col("mid") === col("mid2"))
      .select(col("source_id"), col("target_id")).distinct()

  /** Sanity check a relation is a function (each source maps to exactly
    * one target) — required for lossless hierarchy rollup. */
  def isFunctional(rel: DataFrame): Boolean =
    rel.groupBy("source_id").count().where(col("count") > 1).isEmpty
}
