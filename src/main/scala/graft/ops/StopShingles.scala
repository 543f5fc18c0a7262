package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stop-shingle removal for near-dup candidate generation — the scale
  * defense against ubiquitous shingles (boilerplate, template headers): a
  * shingle present in df documents generates ~df²/2 candidate pairs while
  * discriminating nothing, so the pair join's cost is dominated by the df
  * distribution's tail. Two cap policies:
  *
  *  - FIXED (`maxDf`): drop shingles with df > t. Bounds per-shingle
  *    fan-out at t²/2 pairs — the right knob when the operator knows the
  *    corpus (the r4 stress probe measured 206 s → tunable at the
  *    dup-dense 10× corpus).
  *  - ADAPTIVE (`percentileCap`): derive t from the corpus itself — drop
  *    (at most) the top (1−p) fraction of shingles by df, e.g. p=0.999 ≡
  *    "top 0.1% most-common shingles are stop shingles". This is the
  *    production default when corpora vary too much for one constant
  *    (r4 VERDICT follow-up: the fixed 25 was the one parameterization
  *    gap in the dedup family).
  *
  * The adaptive cut is EXACT and tie-safe without sorting the vocabulary:
  * the df HISTOGRAM (distinct df values → shingle counts) is tiny at any
  * corpus size — df values collapse onto a few hundred distinct counts
  * even at 10^10 shingles — so it collects driver-side (config-sized
  * metadata, same pattern as partition-day lists) and the threshold walk
  * is driver arithmetic. Only WHOLE df-groups are ever dropped (no
  * arbitrary tie-breaking inside a df value), so the result is
  * deterministic regardless of row order: we drop the largest df groups
  * whose total shingle count stays within the (1−p)·V budget.
  */
object StopShingles {

  /** Per-shingle document frequency of a (doc_id, sh) stream. */
  def dfs(sh: DataFrame): DataFrame =
    sh.groupBy("sh").agg(count(lit(1)).as("df"))

  /** The adaptive cap: largest maxDf such that dropping every df-group
    * above it removes at most (1−p)·V shingles (V = distinct shingles).
    * Returns Long.MaxValue (no-op cap) when even the single most frequent
    * df-group exceeds the budget — adaptive capping never drops a partial
    * group. */
  def percentileCap(dfTable: DataFrame, p: Double): Long = {
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val hist = dfTable.groupBy("df").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val v = hist.map(_._2).sum
    val budget = ((1.0 - p) * v).toLong
    // walk down from the highest df; stop at the first group that would
    // blow the budget — `cap` ends at the last fully-dropped group's df
    // minus one, or MaxValue if not even the top group fits
    var acc = 0L
    var cap = Long.MaxValue
    var i = 0
    while (i < hist.length && acc + hist(i)._2 <= budget) {
      acc += hist(i)._2
      cap = hist(i)._1 - 1
      i += 1
    }
    cap
  }

  /** Semi-join `sh` (doc_id, sh) down to shingles with df ≤ cap. */
  def applyCap(sh: DataFrame, dfTable: DataFrame, cap: Long): DataFrame =
    if (cap == Long.MaxValue) sh
    else sh.join(dfTable.where(col("df") <= cap).select("sh"), Seq("sh"), "left_semi")
}
