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

  /** Salted equi-join for a hot-keyed fact against a replicable dimension:
    * the dim side is exploded across `saltBuckets` salt values, the fact
    * side draws a salt per row, and the join runs on (key, salt) — so a
    * key that funnels into one reducer under a plain shuffle join spreads
    * over `saltBuckets` tasks. The result is identical to the plain join
    * for ANY salt assignment (each fact row matches exactly one replica of
    * its key), which is what OpsSpec asserts.
    *
    * The dim side is hinted to a sort-merge join: at demo scale every dim
    * is broadcastable and the planner would (rightly) never shuffle — the
    * hint keeps the salted exchange real so its shape is testable. At
    * 100 TB the hint is unnecessary (a dim past the broadcast threshold
    * shuffles anyway) but harmless; AQE's skew-split is the alternative
    * when the build side cannot be replicated.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = dim.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    fact
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .join(salted.hint("merge"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
