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
    * tie-break column, or equal rows get arbitrary but distinct ranks.
    *
    * The data shuffles EXACTLY ONCE (the range exchange). The local rank
    * is NOT a `Window.partitionBy(pid)` — that formulation forces Catalyst
    * to insert a second full-data hash exchange on pid (range partitioning
    * does not satisfy the window's required distribution, even though pid
    * IS the partition index). Instead the partition-local position comes
    * from `monotonically_increasing_id()` evaluated above
    * `sortWithinPartitions`: Spark defines mid = (partitionIndex << 33) +
    * rowOffsetInPartition assigned in iterator order, so after the
    * within-partition sort, `mid & (2^33-1)` is the 0-based local rank and
    * `mid >> 33` the partition id — pure arithmetic, codegen'd, no
    * exchange, no second sort. (Catalyst never reorders the
    * nondeterministic mid projection across the sort.) Capacity bound:
    * 2^33 ≈ 8.6 G rows per range partition; size `partitions` so no
    * partition approaches that.
    *
    * INVARIANT (pinned by PlanShapeSpec "withGlobalRank shuffles the data
    * exactly once"): the per-partition counts side must read the SAME
    * physical range exchange as the data side (Catalyst exchange reuse —
    * `ReusedExchange` in the final plan). Boundaries are sampled per
    * physical exchange, so two independent exchanges could disagree and
    * silently mis-offset ranks. The spec fails loudly if planning ever
    * stops reusing; eager materialization is NOT a substitute — a
    * data-sized checkpoint per call is the r3 storage-leak shape. */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String,
                     nCol: String, partitions: Int = 16): DataFrame = {
    val ranged = df.repartitionByRange(partitions, order: _*)
    val counts = ranged.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
    // prefix offset AND grand total as two frames over the same tiny
    // table — one broadcast join carries both, no extra cross join
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn(nCol, sum("__cnt").over(wAll))
    ranged
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .withColumn("__lr", (col("__mid") - shiftleft(shiftright(col("__mid"), 33), 33)) + 1L)
      .join(broadcast(offsets.select(col("__pid"), col("__off"), col(nCol))), "__pid")
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__off", "__lr", "__mid")
  }

  /** Adds `cumCol` — the global running sum of integral `valueCol` under
    * `order` — plus `rankCol` and `nCol`, again without a single-partition
    * window: local running sums within each range partition are lifted by
    * broadcast per-partition value-prefix totals, the same two-pass shape
    * as [[withGlobalRank]]. This is the distributed prefix-sum primitive
    * behind coverage/Pareto curves over data-sized ranked tables.
    *
    * Same ReusedExchange invariant as [[withGlobalRank]] (pinned in
    * PlanShapeSpec). Unlike plain rank, the running sum genuinely needs a
    * `Window.partitionBy(__pid)` (a prefix SUM cannot be recovered from
    * monotonically_increasing_id arithmetic), so this one pays the second
    * hash exchange — use [[withGlobalRank]] when only positions matter. */
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
