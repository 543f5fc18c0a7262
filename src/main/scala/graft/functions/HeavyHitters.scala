package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed, MERGEABLE Aggregator
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * Buffer = at most k (item → counter) entries plus the processed-row
  * total n. Guarantees, independent of partitioning and merge order:
  *
  *   - every item with true frequency f > n/(k+1) is PRESENT in the
  *     summary (pigeonhole: each eviction decrements k+1 counters, so at
  *     most n/(k+1) decrements ever hit one item);
  *   - for every tracked item, true − n/(k+1) ≤ estimate ≤ true.
  *
  * The summary alone is therefore a candidate GENERATOR, not an exact
  * answer — `agg_heavy_hitters` (Aggs.scala) follows it with an exact
  * count of just the ≤k candidates, which is what makes the final output
  * deterministic and oracle-checkable. The point at scale: the groupBy
  * runs as partial+final hash aggregate where every map task reduces its
  * slice to ≤k counters before the exchange, and the exact second pass
  * shuffles only rows whose item is among the ≤k candidates — shuffle
  * volume tracks k, never vocabulary width (100 TB of text has a
  * billion-term vocabulary; the heavy tail never travels).
  */
class MisraGries(k: Int) extends Aggregator[String, MisraGries.Buf, MisraGries.Buf] {
  import MisraGries.Buf

  override def zero: Buf = Buf(Map.empty, 0L)

  override def reduce(b: Buf, item: String): Buf = {
    val n = b.n + 1
    b.counts.get(item) match {
      case Some(c) => Buf(b.counts.updated(item, c + 1), n)
      case None if b.counts.size < k => Buf(b.counts.updated(item, 1L), n)
      case None =>
        // eviction step: decrement all k counters (the arriving item's
        // implicit counter hits 0 immediately), drop zeros — O(k), and k
        // is a constant knob
        Buf(b.counts.collect { case (i, c) if c > 1 => (i, c - 1) }, n)
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val sum = b.counts.foldLeft(a.counts) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    val trimmed =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest counter from all, drop ≤0 —
        // preserves both error bounds (Agarwal et al. §3.1)
        val kth = sum.valuesIterator.toArray.sortBy(-_).apply(k)
        sum.collect { case (i, c) if c > kth => (i, c - kth) }
      }
    Buf(trimmed, a.n + b.n)
  }

  override def finish(r: Buf): Buf = r

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Buf] = bufferEncoder
}

object MisraGries {
  /** counts: tracked item → lower-bound counter; n: rows processed. */
  case class Buf(counts: Map[String, Long], n: Long)
}
