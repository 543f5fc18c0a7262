package graft.store

/** Generalized k-D Z-order (Morton) machinery: encode/decode at any axis
  * width and dimension count, the Tropf–Herzog BIGMIN jump, and an exact
  * box → Morton-range cover — the piece that turns "sort by z" into "skip
  * files by z range" at ANY key width (the 3-bit `store_zorder` key
  * enumerated its 12 cells by hand; real stores are 16-20 bits per axis,
  * where the cover must be computed, not listed). The 2-D entry points the
  * r10 keys shipped with delegate verbatim to the k-D cores (r10 VERDICT
  * #5 asked for k ≥ 3; `store_zorder_3d` clusters on three axes).
  *
  * Bit layout: dimension d (0-based) at level i occupies bit position
  * k·i + (k−1−d) — for k = 2 this is exactly the r10 layout (x the ODD
  * positions 2i+1, y the EVEN 2i), so the generalization is
  * behavior-identical where the old code ran. k·bits ≤ 62 keeps every
  * Morton code a nonnegative Long.
  *
  * References (public): Tropf & Herzog 1981, "Multidimensional Range Search
  * in Dynamically Balanced Trees" (the BIGMIN/LITMAX algorithm, stated for
  * arbitrary dimension count); the 2^k-tree cover decomposition is the
  * standard prefix-region recursion used by every Z-order index
  * (Delta/Iceberg OPTIMIZE ZORDER, Lucene BKD, S2 cell covers).
  */
object ZOrder {

  private def checkDims(k: Int, bits: Int): Unit = {
    require(k >= 1, s"need at least one dimension, got $k")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must be 1..62 to fit a Long Morton code, got $k x $bits")
  }

  /** Interleave `vs.length` axis values, each `bits` wide, into a
    * k·bits-bit Morton code. Dimension 0 takes the most significant bit
    * of each k-bit group (the 2-D x convention). */
  def encodeK(vs: Seq[Long], bits: Int): Long = {
    val k = vs.length
    checkDims(k, bits)
    vs.foreach(v => require(v >= 0 && v < (1L << bits),
      s"axis value out of $bits-bit range: $v"))
    var z = 0L
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < k) {
        z |= ((vs(d) >> i) & 1L) << (k * i + (k - 1 - d))
        d += 1
      }
      i += 1
    }
    z
  }

  /** Inverse of [[encodeK]]. */
  def decodeK(z: Long, k: Int, bits: Int): IndexedSeq[Long] = {
    checkDims(k, bits)
    val vs = Array.fill(k)(0L)
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < k) {
        vs(d) |= ((z >> (k * i + (k - 1 - d))) & 1L) << i
        d += 1
      }
      i += 1
    }
    vs.toIndexedSeq
  }

  /** BIGMIN (Tropf–Herzog 1981), k-D form: the smallest Morton code
    * STRICTLY greater than `z` that decodes inside the box
    * [mins(d), maxs(d)] per dimension, or -1 if none. This is the jump a
    * Z-ordered scan makes when it walks off the query box: instead of
    * reading the gap, it seeks directly to the next in-box code. Works on
    * the interleaved codes bit-by-bit from the top — O(k·bits), no
    * enumeration. `z` itself may be inside or outside the box. */
  def bigminK(z: Long, mins: Seq[Long], maxs: Seq[Long], bits: Int): Long = {
    val k = mins.length
    require(maxs.length == k, "mins/maxs dimension mismatch")
    (0 until k).foreach(d => require(mins(d) <= maxs(d), s"empty box in dim $d"))
    var minz = encodeK(mins, bits)
    var maxz = encodeK(maxs, bits)
    if (z >= maxz) return -1L
    if (z < minz) return minz
    var big = -1L
    var p = k * bits - 1
    // load(10*, p): set bit p, zero all LOWER bits of the SAME dimension
    // (every k-th bit below p); load(01*, p): clear bit p, set them.
    def sameDimBelow(p2: Int): Long = {
      var m = 0L; var q = p2 - k
      while (q >= 0) { m |= 1L << q; q -= k }
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

  /** Cover of the k-D box as sorted, disjoint, MAXIMAL (merged) inclusive
    * Morton ranges. With the default unlimited `maxRanges` the cover is
    * EXACT: z ∈ box ⟺ some range contains z. 2^k-tree prefix recursion —
    * a cell fully inside emits one range, a disjoint cell prunes, a
    * straddling cell splits into its 2^k children — then adjacent ranges
    * coalesce.
    *
    * THE k ≥ 3 SCALE FACT (learned the hard way in this spec's first
    * draft): an exact cover's range count is boundary-SURFACE-sized —
    * O(2^bits) in 2-D but O(4^bits) at k = 3 (≈ 4 billion ranges at
    * 16-bit axes) — so exactness at production width is infeasible and
    * no production index computes it. `maxRanges` is the standard answer
    * (S2 cell covers, Delta/Iceberg skipping metadata are budgeted the
    * same way): once the budget is reached, straddling cells emit WHOLE
    * instead of splitting. The result is then a conservative SUPERSET —
    * sorted, disjoint, every in-box z still covered (file skipping stays
    * correct: extra files may be read, needed ones never skipped) — with
    * at most ~maxRanges + k·bits·2^k ranges, and the exact-residual
    * predicate downstream removes the slack rows. */
  def rangeCoverK(mins: Seq[Long], maxs: Seq[Long], bits: Int,
                  maxRanges: Int = Int.MaxValue): Seq[(Long, Long)] = {
    val k = mins.length
    require(maxs.length == k, "mins/maxs dimension mismatch")
    checkDims(k, bits)
    require(maxRanges >= 1, "need a positive range budget")
    (0 until k).foreach { d =>
      require(mins(d) <= maxs(d), s"empty box in dim $d")
      require(maxs(d) < (1L << bits), s"box exceeds width in dim $d")
    }
    val children = 1 << k
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // cell = Morton prefix `pre` covering a hypercube of side 2^level
    def walk(pre: Long, level: Int): Unit = {
      val side = 1L << level
      val span = // side^k = total z codes in the cell
        1L << (k * level)
      val origin = decodeK(pre, k, bits) // cell origin (low bits of pre are 0)
      val disjoint = (0 until k).exists(d =>
        origin(d) > maxs(d) || origin(d) + side - 1 < mins(d))
      val inside = (0 until k).forall(d =>
        origin(d) >= mins(d) && origin(d) + side - 1 <= maxs(d))
      if (disjoint) ()
      else if (inside) out += ((pre, pre + span - 1)) // fully inside: one z run
      else if (out.size >= maxRanges)
        out += ((pre, pre + span - 1)) // budget spent: loose whole cell
      else {
        val childSpan = span / children
        var q = 0L
        while (q < children) { walk(pre + q * childSpan, level - 1); q += 1 }
      }
    }
    walk(0L, bits)
    // coalesce adjacent runs (the 2^k-tree emits them in ascending z order)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 + 1 == lo)
        merged(merged.size - 1) = (merged.last._1, hi)
      else merged += ((lo, hi))
    }
    merged.toSeq
  }

  // ---- 2-D entry points (r10 surface, bit layout unchanged) ----

  /** Interleave two `bits`-wide axis values into a 2·bits Morton code. */
  def encode(x: Long, y: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    encodeK(Seq(x, y), bits)
  }

  /** Inverse of [[encode]]. */
  def decode(z: Long, bits: Int): (Long, Long) = {
    val vs = decodeK(z, 2, bits)
    (vs(0), vs(1))
  }

  /** BIGMIN (Tropf–Herzog 1981) over the 2-D rectangle — see [[bigminK]]. */
  def bigmin(z: Long, xmin: Long, xmax: Long, ymin: Long, ymax: Long,
             bits: Int): Long =
    bigminK(z, Seq(xmin, ymin), Seq(xmax, ymax), bits)

  /** Exact 2-D rectangle cover — see [[rangeCoverK]]. */
  def rangeCover(xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                 bits: Int): Seq[(Long, Long)] =
    rangeCoverK(Seq(xmin, ymin), Seq(xmax, ymax), bits)
}
