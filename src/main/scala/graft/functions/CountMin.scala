package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a typed, MERGEABLE Aggregator.
  *
  * Buffer = a depth×width counter matrix (one flat Array[Long]); each item
  * increments one counter per row, chosen by a seeded-md5 bucket hash.
  * Counters are plain sums, so the sketch is
  *
  *   - fully mergeable (elementwise add, associative + commutative), and
  *   - DETERMINISTIC regardless of partitioning and merge order — unlike a
  *     Misra–Gries summary, whose tracked-item set is partition-dependent.
  *
  * That determinism is what makes `agg_count_min` hash-checkable: the
  * finished sketch's counter for (row r, bucket b) equals
  * `sum(true_count(item))` over items hashing to b under seed r, a value
  * the DuckDB oracle reconstructs in closed form with the same md5 bucket
  * function — the estimates are pinned EXACTLY cross-engine, not within a
  * tolerance band.
  *
  * Estimate guarantees (any data, any merge tree): for every item,
  * `true ≤ estimate`, and with width w the expected per-row excess is
  * ≤ N/w; taking the min over `depth` independent rows drives the
  * probability of a large excess down exponentially in depth.
  *
  * The 100 TB stance matches the other sketch keys: the groupBy-free
  * aggregation runs as partial+final hash aggregate where every map task
  * reduces its slice to one depth×width matrix before the exchange —
  * shuffle volume is the constant sketch size (d·w longs), never data or
  * vocabulary volume. Point-query readout broadcasts the one-row sketch.
  */
class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.bucket(r, item, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Second-level Count-Min aggregation: merges FINISHED sketches by
  * elementwise addition (the partial-rollup shape — daily sketches stored
  * in a trend rollup, merged to weekly/monthly grain without re-reading
  * raw data). Counter addition is associative + commutative, so
  * merge(cm(A), cm(B)) = cm(A ⊎ B) EXACTLY — the merged readout is
  * DETERMINISTIC and the oracle recomputes the coarser grain's counters
  * directly from raw in closed form (the KmvMerge twin for frequencies
  * instead of distincts). */
class CountMinMerge(depth: Int, width: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](depth * width)
  override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += sk(i); i += 1 }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMin {

  /** Row-`r` bucket of `item`: first 8 hex chars of md5("r:item") mod
    * width — 32 bits of digest, so the value is non-negative in a Long.
    * MUST stay in lockstep with [[estimateCol]]'s SQL-side twin (pinned
    * by CountMinSpec). */
  def bucket(r: Int, item: String, width: Int): Int = {
    // r12: thread-local digest + direct byte arithmetic — the same value
    // as parseLong(first8HexChars, 16) % width (first 4 digest bytes as an
    // unsigned 32-bit int), without a per-row MessageDigest + formatted
    // hex string. SketchSpec's cross-engine lockstep pins the bucket
    // function unchanged.
    val dig = HashOps.md5(s"$r:$item".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    (v % width).toInt
  }

  /** Point-query estimate over a finished sketch column: the min over
    * rows of the item's counter. Pure `org.apache.spark.sql.functions`
    * composition (md5 → conv → element_at → least), so the readout
    * codegens and never leaves the JVM expression path; the bucket math
    * is the exact SQL twin of [[bucket]]. */
  def estimateCol(sketch: Column, item: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { r =>
      val bkt = (conv(substring(md5(concat(lit(s"$r:"), item)), 1, 8), 16, 10)
        .cast("long") % width).cast("int")
      element_at(sketch, bkt + lit(r * width) + lit(1))
    }: _*)
}
