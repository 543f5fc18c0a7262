package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV ("k minimum values") distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002; the
  * bottom-k form surveyed in Beyer et al. SIGMOD 2007) as a typed,
  * MERGEABLE Aggregator.
  *
  * Buffer = the ≤k smallest DISTINCT 60-bit md5 hash values seen, kept
  * sorted ascending. Bottom-k of a set is a pure function of the set —
  * insertion order, partitioning, and merge-tree shape all cancel — so
  * like [[CountMin]] (and unlike Misra–Gries) the finished sketch is
  * DETERMINISTIC, and the DuckDB oracle reconstructs it in closed form:
  * the k-th smallest distinct hash per group is one window expression,
  * and the estimate
  *
  *   D̂ = (k−1) / (h_k / 2^60)
  *
  * is two IEEE divides of exactly-agreed integers (2^60 is a power of
  * two, so the normalizing literal is exact) — pinned EXACTLY
  * cross-engine, where the HLL keys can only be tolerance-checked.
  * With fewer than k distinct hashes the sketch IS the distinct set and
  * the estimate is exact by construction.
  *
  * Estimate quality: h_k/2^60 estimates k/(D+1) (order statistics of
  * uniform hashes), giving relative error ~1/√(k−2) — k=64 ⇒ ~13%.
  *
  * 100 TB stance (same as the other sketch keys): partial+final hash
  * aggregation reduces every map task's slice to one ≤k-entry array
  * before the exchange — shuffle volume tracks k per group, never
  * data or cardinality volume. The per-row insert allocates only when
  * the hash actually enters the bottom-k (at steady state almost
  * never: P(enter) = k/D_seen).
  */
class Kmv(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], item: String): Array[Long] =
    Kmv.insert(buf, Kmv.hash60(item), k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the k smallest distinct
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val next =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || out(n - 1) != next) { out(n) = next; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Second-level KMV aggregation: merges FINISHED bottom-k sketches (the
  * partial-rollup shape — daily sketches stored in a trend rollup, merged
  * to weekly/monthly grain WITHOUT re-reading raw data). Because bottom-k
  * of a set is a pure function of the set, merge(bottom-k(A), bottom-k(B))
  * = bottom-k(A ∪ B) exactly — so unlike HLL union (`agg_sketch_merge`,
  * tolerance-checked), the merged estimate is DETERMINISTIC and the
  * oracle recomputes it from raw in closed form. */
class KmvMerge(k: Int) extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  private val kmv = new Kmv(k)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] =
    kmv.merge(buf, sk.toArray)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = kmv.merge(a, b)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object Kmv {

  /** 60-bit hash: first 15 hex chars of md5(item) — non-negative in a
    * Long, and exactly the SQL twin `conv(substring(md5(item),1,15),16,10)`
    * / DuckDB `CAST(concat('0x', substring(md5(item),1,15)) AS BIGINT)`.
    * Lockstep pinned by SketchSpec. */
  def hash60(item: String): Long = {
    // r12: thread-local digest + direct byte arithmetic — the same value
    // as parseLong(first15HexChars, 16) (7 full digest bytes + the high
    // nibble of byte 7), without a per-row MessageDigest + formatted hex
    // string. SketchSpec's cross-engine lockstep pins the hash unchanged.
    val dig = HashOps.md5(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }

  /** Insert `h` into sorted-distinct `buf`, keeping at most `k` smallest.
    * Returns `buf` unchanged (same reference) when `h` is a duplicate or
    * too large to enter. */
  def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    if (ins >= k) return buf // larger than the current k smallest
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }
}
