package graft.store

/** Generalized 2-D Z-order (Morton) machinery: encode/decode at any axis
  * width, the Tropf–Herzog BIGMIN jump, and an exact rectangle → Morton-
  * range cover — the piece that turns "sort by z" into "skip files by z
  * range" at ANY key width (the 3-bit `store_zorder` key enumerated its 12
  * cells by hand; real stores are 16-20 bits per axis, where the cover must
  * be computed, not listed).
  *
  * Bit layout matches `store_zorder`: x occupies the ODD bit positions
  * (bit 2i+1), y the EVEN ones (bit 2i), for i in [0, bits).
  *
  * References (public): Tropf & Herzog 1981, "Multidimensional Range Search
  * in Dynamically Balanced Trees" (the BIGMIN/LITMAX algorithm); the
  * quadtree cover decomposition is the standard prefix-region recursion
  * used by every Z-order index (Delta/Iceberg OPTIMIZE ZORDER, Lucene BKD,
  * S2 cell covers).
  */
object ZOrder {

  /** Interleave two `bits`-wide axis values into a 2·bits Morton code. */
  def encode(x: Long, y: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    require(x >= 0 && x < (1L << bits) && y >= 0 && y < (1L << bits),
      s"axis value out of $bits-bit range: ($x, $y)")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  /** Inverse of [[encode]]. */
  def decode(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i + 1)) & 1L) << i
      y |= ((z >> (2 * i)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  private def inBox(z: Long, xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                    bits: Int): Boolean = {
    val (x, y) = decode(z, bits)
    x >= xmin && x <= xmax && y >= ymin && y <= ymax
  }

  /** BIGMIN (Tropf–Herzog 1981): the smallest Morton code STRICTLY greater
    * than `z` that decodes inside the rectangle, or -1 if none. This is the
    * jump a Z-ordered scan makes when it walks off the query box: instead
    * of reading the gap, it seeks directly to the next in-box code. Works
    * on the interleaved codes bit-by-bit from the top — O(bits), no
    * enumeration. `z` itself may be inside or outside the box. */
  def bigmin(z: Long, xmin: Long, xmax: Long, ymin: Long, ymax: Long,
             bits: Int): Long = {
    var minz = encode(xmin, ymin, bits)
    var maxz = encode(xmax, ymax, bits)
    if (z >= maxz) return -1L
    if (z < minz) return minz
    var big = -1L
    var p = 2 * bits - 1
    // load(10*, p, v): set bit p, zero all LOWER bits of the SAME dimension
    // (every second bit below p); load(01*, p, v): clear bit p, set them.
    def sameDimBelow(p2: Int): Long = {
      var m = 0L; var q = p2 - 2
      while (q >= 0) { m |= 1L << q; q -= 2 }
      m
    }
    while (p >= 0) {
      val zb = (z >> p) & 1L
      val nb = (minz >> p) & 1L
      val xb = (maxz >> p) & 1L
      (zb, nb, xb) match {
        case (0L, 0L, 0L) => ()
        case (0L, 0L, 1L) =>
          big = (minz | (1L << p)) & ~sameDimBelow(p)
          maxz = (maxz & ~(1L << p)) | sameDimBelow(p)
        case (0L, 1L, 1L) => return minz
        case (1L, 0L, 0L) => return big
        case (1L, 0L, 1L) =>
          minz = (minz | (1L << p)) & ~sameDimBelow(p)
        case (1L, 1L, 1L) => ()
        case other =>
          throw new IllegalStateException(s"minz > maxz bit pattern $other at $p")
      }
      p -= 1
    }
    big
  }

  /** Exact cover of the rectangle as sorted, disjoint, MAXIMAL (merged)
    * inclusive Morton ranges: z ∈ box ⟺ some range contains z. Quadtree
    * prefix recursion — a cell fully inside emits one range, a disjoint
    * cell prunes, a straddling cell splits into its 4 children — then
    * adjacent ranges coalesce. O(#ranges · bits) work, independent of box
    * area, so it holds at production widths where the 3-bit key's explicit
    * cell enumeration cannot. */
  def rangeCover(xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                 bits: Int): Seq[(Long, Long)] = {
    require(xmin <= xmax && ymin <= ymax, "empty rectangle")
    require(xmax < (1L << bits) && ymax < (1L << bits), "rectangle exceeds width")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // cell = Morton prefix `pre` covering a square of side 2^level
    def walk(pre: Long, level: Int): Unit = {
      val side = 1L << level
      val (cx, cy) = decode(pre, bits) // cell origin (low bits of pre are 0)
      if (cx > xmax || cx + side - 1 < xmin || cy > ymax || cy + side - 1 < ymin) ()
      else if (cx >= xmin && cx + side - 1 <= xmax && cy >= ymin && cy + side - 1 <= ymax)
        out += ((pre, pre + side * side - 1)) // fully inside: one z run
      else {
        val childSpan = (side * side) / 4
        var q = 0L
        while (q < 4) { walk(pre + q * childSpan, level - 1); q += 1 }
      }
    }
    walk(0L, bits)
    // coalesce adjacent runs (quadtree emits them in ascending z order)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 + 1 == lo)
        merged(merged.size - 1) = (merged.last._1, hi)
      else merged += ((lo, hi))
    }
    merged.toSeq
  }
}
