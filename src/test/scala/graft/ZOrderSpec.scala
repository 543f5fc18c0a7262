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
}
