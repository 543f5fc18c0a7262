package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for 100 TB shapes. AQE handles skewed
  * sort-merge joins automatically; these cover the aggregation side, where
  * a hot group key funnels one reducer.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys + random salt) computes
    * partial aggregates across `saltBuckets` reducers, then a second tiny
    * aggregation merges the partials per key. Correct for re-aggregable
    * aggregates (sum / count / min / max — pass what the final merge
    * should do). Use when one key holds a disproportionate share of rows;
    * the hot key's work spreads over `saltBuckets` tasks instead of one.
    *
    * aggs: output column -> (input column, "sum"|"count"|"min"|"max")
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Map[String, (String, String)]): DataFrame = {
    require(saltBuckets > 0)
    def partial(name: String, in: String, op: String): Column = op match {
      case "sum"   => sum(col(in)).as(name)
      case "count" => count(lit(1)).as(name)
      case "min"   => min(col(in)).as(name)
      case "max"   => max(col(in)).as(name)
      case other   => throw new IllegalArgumentException(s"non-mergeable agg: $other")
    }
    def merge(name: String, op: String): Column = op match {
      case "sum" | "count" => sum(col(name)).as(name)
      case "min"           => min(col(name)).as(name)
      case "max"           => max(col(name)).as(name)
      case other           => throw new IllegalArgumentException(other)
    }
    val p = aggs.toSeq.map { case (n, (in, op)) => partial(n, in, op) }
    val m = aggs.toSeq.map { case (n, (_, op)) => merge(n, op) }
    val salted = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(p.head, p.tail: _*)
    salted.groupBy(keys.map(col): _*).agg(m.head, m.tail: _*)
  }
}
