package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate: (similarity, neighbor id, neighbor label). */
case class Neighbor(sim: Double, cId: Long, label: Int)

/** Bounded top-k aggregation: keeps the k best neighbors by
  * (sim desc, cId asc) — a deterministic total order.
  *
  * The point at scale: `groupBy(q).agg(topK)` runs as a partial+final
  * hash aggregate, so each map task reduces its candidate rows to at most
  * k per query BEFORE the shuffle — the exchange carries tiny top-k lists
  * instead of every candidate pair, unlike a window `row_number` which
  * must shuffle and sort the full candidate set.
  */
class TopKNeighbors(k: Int) extends Aggregator[Neighbor, List[Neighbor], List[Neighbor]] {
  // Fully total order (label as the final tie-break): in the k-NN query a
  // candidate id appears once per query so (sim, cId) already decides, but
  // a partial order would make reduce/merge order-sensitive for pathological
  // inputs — found by the InvariantProps generative test.
  private def better(a: Neighbor, b: Neighbor): Boolean =
    a.sim > b.sim ||
      (a.sim == b.sim && (a.cId < b.cId ||
        (a.cId == b.cId && a.label < b.label)))

  override def zero: List[Neighbor] = Nil

  override def reduce(buf: List[Neighbor], n: Neighbor): List[Neighbor] = {
    // insertion into a k-bounded sorted list; k is small (5) so this is
    // O(k) per row with no allocation churn beyond the list cells
    if (buf.sizeIs >= k && !better(n, buf.last)) buf
    else {
      val (pre, post) = buf.span(b => better(b, n))
      (pre ::: n :: post).take(k)
    }
  }

  override def merge(a: List[Neighbor], b: List[Neighbor]): List[Neighbor] = {
    @annotation.tailrec
    def go(x: List[Neighbor], y: List[Neighbor], acc: List[Neighbor], n: Int): List[Neighbor] =
      if (n == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil)         => acc.reverse
        case (xs, Nil)          => acc.reverse ::: xs.take(n)
        case (Nil, ys)          => acc.reverse ::: ys.take(n)
        case (xh :: xt, yh :: _) if better(xh, yh) => go(xt, y, xh :: acc, n - 1)
        case (_, yh :: yt)      => go(x, yt, yh :: acc, n - 1)
      }
    go(a, b, Nil, k)
  }

  override def finish(r: List[Neighbor]): List[Neighbor] = r

  override def bufferEncoder: Encoder[List[Neighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Neighbor]]()
  override def outputEncoder: Encoder[List[Neighbor]] = bufferEncoder
}
