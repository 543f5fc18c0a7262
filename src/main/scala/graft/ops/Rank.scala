package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scalable replacement for a
  * partition-less window (which funnels every row through a single task).
  * Two passes: range-partition on the total order key, `row_number` within
  * each range, then lift local ranks to global ones by adding each
  * partition's broadcast prefix offset. The per-partition count table is
  * partitions-sized (tiny at any data scale), so the only partition-less
  * window runs over it, never over the data.
  *
  * Shared by `win_analytic` (ntile/percent_rank/cume_dist) and `agg_rfm`
  * (three independent quintile scores).
  */
object Rank {

  /** Adds `rankCol` (1-based global rank under `order`) and `nCol` (total
    * row count) to `df`. `order` must be a total order — append a unique
    * tie-break column, or equal rows get arbitrary but distinct ranks. */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String,
                     nCol: String, partitions: Int = 16): DataFrame = {
    val parts = df.repartitionByRange(partitions, order: _*)
      .withColumn("__pid", spark_partition_id())
    val counts = parts.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    // prefix offset AND grand total as two frames over the same tiny
    // table — one broadcast join carries both, no extra cross join
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn(nCol, sum("__cnt").over(wAll))
    val wLocal = Window.partitionBy("__pid").orderBy(order: _*)
    parts
      .withColumn("__lr", row_number().over(wLocal))
      .join(broadcast(offsets.select(col("__pid"), col("__off"), col(nCol))), "__pid")
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__off", "__lr")
  }

  /** Adds `cumCol` — the global running sum of integral `valueCol` under
    * `order` — plus `rankCol` and `nCol`, again without a single-partition
    * window: local running sums within each range partition are lifted by
    * broadcast per-partition value-prefix totals, the same two-pass shape
    * as [[withGlobalRank]]. This is the distributed prefix-sum primitive
    * behind coverage/Pareto curves over data-sized ranked tables. */
  def withGlobalCumSum(df: DataFrame, order: Seq[Column], valueCol: String,
                       cumCol: String, rankCol: String, nCol: String,
                       partitions: Int = 16): DataFrame = {
    val parts = df.repartitionByRange(partitions, order: _*)
      .withColumn("__pid", spark_partition_id())
    val stats = parts.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__vsum"))
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = stats
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn("__voff", coalesce(sum("__vsum").over(wOff), lit(0L)))
      .withColumn(nCol, sum("__cnt").over(wAll))
    val wLocal = Window.partitionBy("__pid").orderBy(order: _*)
    parts
      .withColumn("__lr", row_number().over(wLocal))
      .withColumn("__lsum", sum(col(valueCol)).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets.select(col("__pid"), col("__off"), col("__voff"), col(nCol))), "__pid")
      .withColumn(rankCol, col("__off") + col("__lr"))
      .withColumn(cumCol, col("__voff") + col("__lsum"))
      .drop("__pid", "__off", "__voff", "__lr", "__lsum")
  }

  /** Exact ntile arithmetic on a global rank: the first (n mod t) tiles
    * carry ceil(n/t) rows, the rest floor(n/t) — SQL-standard NTILE from
    * integer (rank, n) alone, stated as an expr so it stays codegen'd.
    * The ELSE's div-by-zero branch is unreachable when n < t (the WHEN
    * then covers every rank). */
  def ntileExpr(tiles: Int, g: String, n: String): Column = expr(
    s"""CAST(CASE WHEN $g <= ($n % $tiles) * ($n div $tiles + 1)
       |  THEN ($g - 1) div ($n div $tiles + 1) + 1
       |  ELSE ($n % $tiles) + ($g - ($n % $tiles) * ($n div $tiles + 1) - 1) div ($n div $tiles) + 1
       |END AS INT)""".stripMargin)
}
