package graft.ops

/** Planar convex hull (Andrew's monotone chain, 1979 — public textbook
  * algorithm) over exact integer coordinates: all orientation tests are
  * long cross products, no floats, so the hull is deterministic on any
  * box. Strict turns (`<= 0` pop) drop collinear boundary points and
  * duplicates — the hull is the minimal vertex set.
  *
  * This is the declared scale path of `geo_diameter`: diameter endpoints
  * are hull vertices, so a per-block O(k log k) hull + O(h²) vertex scan
  * replaces the O(k²) pair join once blocks outgrow dimension grain. */
object Hull {

  /** Hull vertices in counter-clockwise order starting from the
    * lexicographically smallest point. Degenerate inputs (≤ 2 distinct
    * points, all-collinear) return the distinct extreme points. */
  def monotoneChain(points: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val pts = points.distinct.sorted
    if (pts.size <= 2) return pts
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      ps.foreach { p =>
        while (st.size >= 2 && cross(st(st.size - 2), st(st.size - 1), p) <= 0)
          st.remove(st.size - 1)
        st += p
      }
      st.toSeq
    }
    val lower = half(pts)
    val upper = half(pts.reverse)
    (lower.dropRight(1) ++ upper.dropRight(1)) match {
      case s if s.isEmpty => pts.take(1) // all points identical after distinct
      case s => s
    }
  }
}
