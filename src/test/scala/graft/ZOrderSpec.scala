package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.ZOrder

/** The generalized Z-order machinery: encode/decode bijection, the
  * Tropf–Herzog BIGMIN jump against brute force, and the rectangle →
  * Morton-range cover — exhaustively at demo widths, invariant-pinned at
  * production widths where enumeration is infeasible. No SparkSession:
  * this is pure index arithmetic. */
class ZOrderSpec extends AnyFunSuite {

  private def brute(xmin: Long, xmax: Long, ymin: Long, ymax: Long,
                    bits: Int): Seq[Long] =
    (0L until (1L << (2 * bits))).filter { z =>
      val (x, y) = ZOrder.decode(z, bits)
      x >= xmin && x <= xmax && y >= ymin && y <= ymax
    }

  test("encode/decode are inverse bijections at widths 3, 6, 16") {
    for (bits <- Seq(3, 6, 16)) {
      val rnd = new scala.util.Random(bits) // fixed seed per width
      (1 to 500).foreach { _ =>
        val x = rnd.nextLong() & ((1L << bits) - 1)
        val y = rnd.nextLong() & ((1L << bits) - 1)
        assert(ZOrder.decode(ZOrder.encode(x, y, bits), bits) == ((x, y)))
      }
    }
    // every z at width 3 decodes and re-encodes to itself (bijection)
    (0L until 64L).foreach(z => assert(ZOrder.encode(
      ZOrder.decode(z, 3)._1, ZOrder.decode(z, 3)._2, 3) == z))
  }

  test("bigmin equals the brute-force next in-box code for EVERY box and z at 3 bits") {
    val n = 1L << 3
    for {
      xmin <- 0L until n; xmax <- xmin until n
      ymin <- 0L until n; ymax <- ymin until n
    } {
      val inBox = brute(xmin, xmax, ymin, ymax, 3).toSet
      (0L until 64L).foreach { z =>
        val expect = inBox.filter(_ > z) match {
          case s if s.isEmpty => -1L
          case s => s.min
        }
        val got = ZOrder.bigmin(z, xmin, xmax, ymin, ymax, 3)
        assert(got == expect,
          s"bigmin($z) in box [$xmin,$xmax]x[$ymin,$ymax]: got $got want $expect")
      }
    }
  }

  test("rangeCover is the exact, sorted, disjoint, MAXIMAL cover for every 3-bit box") {
    val n = 1L << 3
    for {
      xmin <- 0L until n; xmax <- xmin until n
      ymin <- 0L until n; ymax <- ymin until n
    } {
      val cover = ZOrder.rangeCover(xmin, xmax, ymin, ymax, 3)
      val expect = brute(xmin, xmax, ymin, ymax, 3)
      assert(cover.flatMap { case (lo, hi) => lo to hi } == expect,
        s"cover of [$xmin,$xmax]x[$ymin,$ymax] != brute enumeration")
      // maximal: no two adjacent ranges left unmerged
      cover.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"unmerged ranges in $cover")
        case _ => ()
      }
    }
  }

  test("the computed cover equals store_zorder's formerly hand-enumerated 12 cells") {
    val enumerated = (for { x <- 2 to 5; y <- 1 to 3 } yield
      (0 until 3).map(i => (((x >> i) & 1) << (2 * i + 1))
        | (((y >> i) & 1) << (2 * i))).sum.toLong).sorted
    val fromCover = ZOrder.rangeCover(2, 5, 1, 3, bits = 3)
      .flatMap { case (lo, hi) => lo to hi }
    assert(fromCover == enumerated)
  }

  test("production width (16+16 bits): cover invariants hold without enumeration") {
    val (xmin, xmax, ymin, ymax) = (1234L, 45000L, 9876L, 61000L)
    val cover = ZOrder.rangeCover(xmin, xmax, ymin, ymax, bits = 16)
    // exactness by area: disjoint sorted ranges whose total length is the
    // rectangle's area, with every endpoint decoding inside the box, IS
    // the exact cover (any wrong cell would push the total over or under)
    assert(cover.nonEmpty)
    cover.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
      case _ => ()
    }
    val area = (xmax - xmin + 1) * (ymax - ymin + 1)
    assert(cover.map { case (lo, hi) => hi - lo + 1 }.sum == area)
    cover.foreach { case (lo, hi) =>
      val (lx, ly) = ZOrder.decode(lo, 16); val (hx, hy) = ZOrder.decode(hi, 16)
      assert(lx >= xmin && lx <= xmax && ly >= ymin && ly <= ymax)
      assert(hx >= xmin && hx <= xmax && hy >= ymin && hy <= ymax)
    }
    // membership: random in-box points land in some range, out-of-box
    // points (just outside each edge) land in none
    val rnd = new scala.util.Random(42)
    def covered(z: Long) = cover.exists { case (lo, hi) => z >= lo && z <= hi }
    (1 to 200).foreach { _ =>
      val x = xmin + (rnd.nextLong().abs % (xmax - xmin + 1))
      val y = ymin + (rnd.nextLong().abs % (ymax - ymin + 1))
      assert(covered(ZOrder.encode(x, y, 16)))
    }
    assert(!covered(ZOrder.encode(xmin - 1, ymin, 16)))
    assert(!covered(ZOrder.encode(xmax + 1, ymax, 16)))
    assert(!covered(ZOrder.encode(xmin, ymax + 1, 16)))
    // bigmin consistency across gaps: jumping from one range's end lands
    // exactly on the next range's start (the walk a Z-ordered scan makes)
    cover.sliding(2).take(50).foreach {
      case Seq((_, h1), (l2, _)) =>
        assert(ZOrder.bigmin(h1, xmin, xmax, ymin, ymax, 16) == l2)
      case _ => ()
    }
    assert(ZOrder.bigmin(cover.last._2, xmin, xmax, ymin, ymax, 16) == -1L)
  }

  // ---- k-D generalization (r11; r10 VERDICT #5) ----

  private def bruteK(mins: Seq[Long], maxs: Seq[Long], bits: Int): Seq[Long] = {
    val k = mins.length
    (0L until (1L << (k * bits))).filter { z =>
      val vs = ZOrder.decodeK(z, k, bits)
      (0 until k).forall(d => vs(d) >= mins(d) && vs(d) <= maxs(d))
    }
  }

  test("k-D encode/decode are inverse bijections (3-dim exhaustive at 2 bits, random at 3x16/5x12)") {
    (0L until 64L).foreach { z =>
      assert(ZOrder.encodeK(ZOrder.decodeK(z, 3, 2), 2) == z)
    }
    for ((k, bits) <- Seq((3, 16), (5, 12))) {
      val rnd = new scala.util.Random(k * 100 + bits)
      (1 to 300).foreach { _ =>
        val vs = Seq.fill(k)(rnd.nextLong() & ((1L << bits) - 1))
        assert(ZOrder.decodeK(ZOrder.encodeK(vs, bits), k, bits) == vs)
      }
    }
  }

  test("2-D entry points delegate bit-identically to the k-D cores (3-bit exhaustive)") {
    for (x <- 0L until 8L; y <- 0L until 8L) {
      assert(ZOrder.encode(x, y, 3) == ZOrder.encodeK(Seq(x, y), 3))
    }
    (0L until 64L).foreach { z =>
      val (x, y) = ZOrder.decode(z, 3)
      assert(ZOrder.decodeK(z, 2, 3) == Seq(x, y))
    }
  }

  test("bigminK equals the brute-force next in-box code for EVERY 3-dim box and z at 2 bits") {
    val n = 1L << 2
    for {
      x0 <- 0L until n; x1 <- x0 until n
      y0 <- 0L until n; y1 <- y0 until n
      v0 <- 0L until n; v1 <- v0 until n
    } {
      val mins = Seq(x0, y0, v0); val maxs = Seq(x1, y1, v1)
      val inBox = bruteK(mins, maxs, 2).toSet
      (0L until 64L).foreach { z =>
        val expect = inBox.filter(_ > z) match {
          case s if s.isEmpty => -1L
          case s => s.min
        }
        val got = ZOrder.bigminK(z, mins, maxs, 2)
        assert(got == expect, s"bigminK($z) in box $mins..$maxs: got $got want $expect")
      }
    }
  }

  test("rangeCoverK is the exact, sorted, disjoint, MAXIMAL cover for every 3-dim 2-bit box") {
    val n = 1L << 2
    for {
      x0 <- 0L until n; x1 <- x0 until n
      y0 <- 0L until n; y1 <- y0 until n
      v0 <- 0L until n; v1 <- v0 until n
    } {
      val mins = Seq(x0, y0, v0); val maxs = Seq(x1, y1, v1)
      val cover = ZOrder.rangeCoverK(mins, maxs, 2)
      assert(cover.flatMap { case (lo, hi) => lo to hi } == bruteK(mins, maxs, 2),
        s"cover of $mins..$maxs != brute enumeration")
      cover.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"unmerged ranges in $cover")
        case _ => ()
      }
    }
  }

  test("3-dim production width (3x16 bits): BUDGETED cover is a sorted disjoint superset") {
    // an EXACT 3-D cover at 16-bit axes is boundary-surface-sized
    // (O(4^bits) ~ 4e9 ranges — this spec's first draft OOM'd computing
    // it); production covers are budgeted, so that is what we pin
    val mins = Seq(1234L, 9876L, 100L)
    val maxs = Seq(45000L, 61000L, 50000L)
    val budget = 4096
    val cover = ZOrder.rangeCoverK(mins, maxs, 16, maxRanges = budget)
    assert(cover.nonEmpty)
    // bounded: budget + straddling-cell slack (k·bits·2^k)
    assert(cover.size <= budget + 3 * 16 * 8, s"cover size ${cover.size}")
    cover.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
      case _ => ()
    }
    // superset: total length at least the box volume, and bounded by the
    // whole space (sanity, not tightness — looseness is the budget trade)
    val volume = (0 until 3).map(d => maxs(d) - mins(d) + 1).product
    val total = cover.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(total >= volume)
    assert(total < (1L << 48))
    // membership: every in-box z is covered (the conservative contract —
    // a skipped-but-needed file is the one unforgivable failure)
    val rnd = new scala.util.Random(7)
    def covered(z: Long) = {
      val idx = cover.lastIndexWhere(_._1 <= z)
      idx >= 0 && z <= cover(idx)._2
    }
    (1 to 300).foreach { _ =>
      val vs = (0 until 3).map(d => mins(d) + (rnd.nextLong().abs % (maxs(d) - mins(d) + 1)))
      assert(covered(ZOrder.encodeK(vs, 16)))
    }
    // at a SMALL width the default cover stays exact in 3-D (budget never
    // hit): cross-check bigminK jumps across its gaps
    val smins = Seq(3L, 10L, 1L); val smaxs = Seq(40L, 60L, 50L)
    val exact = ZOrder.rangeCoverK(smins, smaxs, 6)
    val svol = (0 until 3).map(d => smaxs(d) - smins(d) + 1).product
    assert(exact.map { case (lo, hi) => hi - lo + 1 }.sum == svol)
    exact.sliding(2).take(50).foreach {
      case Seq((_, h1), (l2, _)) => assert(ZOrder.bigminK(h1, smins, smaxs, 6) == l2)
      case _ => ()
    }
    assert(ZOrder.bigminK(exact.last._2, smins, smaxs, 6) == -1L)
  }
}
