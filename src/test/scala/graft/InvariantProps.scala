package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Properties}

import graft.multimodal.Media
import graft.sources.MeasurementXml

/** Generative properties over the pure (driver-side) kernels — run by
  * scalacheck's own sbt test framework. Spark-job invariants live in
  * InvariantsSpec; these cover the algebra that must hold for ANY input. */
object InvariantProps extends Properties("graft.kernels") {

  private val weighted = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(-1e4, 1e4), Gen.choose(0.1, 100.0)))

  property("weightedAvg: split+merge equals direct fold for any split") =
    Prop.forAll(weighted, Gen.choose(0, 1000)) { (xs, cut) =>
      val direct = {
        val (n, d) = xs.foldLeft((0.0, 0.0)) { case ((n, d), (v, w)) => (n + v * w, d + w) }
        n / d
      }
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      def fold(p: List[(Double, Double)]) =
        p.foldLeft(graft.functions.WeightedAvg.zero)(graft.functions.WeightedAvg.reduce)
      val merged = graft.functions.WeightedAvg.finish(
        graft.functions.WeightedAvg.merge(fold(l), fold(r)))
      math.abs(merged - direct) <= 1e-9 * math.max(1.0, math.abs(direct))
    }

  property("byteHistogram: 16 bins, normalized, deterministic") =
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val h = Media.byteHistogram(arr)
      val h2 = Media.byteHistogram(arr)
      h.length == 16 &&
        h.sameElements(h2) &&
        (arr.isEmpty || math.abs(h.sum - 1.0) < 1e-9) &&
        h.forall(b => b >= 0.0 && b <= 1.0)
    }

  private val dnGen = for {
    net <- Gen.alphaUpperChar
    node <- Gen.choose(0, 999)
  } yield f"Network=$net%c,Node=$node%03d"

  private val measRow = for {
    dn <- dnGen
    hour <- Gen.choose(0, 23)
    a <- Gen.option(Gen.choose(-1e6, 1e6))
    b <- Gen.option(Gen.choose(-1e6, 1e6))
  } yield Row(dn, Timestamp.valueOf(f"2024-03-01 $hour%02d:00:00"),
    a.map(v => math.rint(v * 1e4) / 1e4).map(java.lang.Double.valueOf).orNull,
    b.map(v => math.rint(v * 1e4) / 1e4).map(java.lang.Double.valueOf).orNull)

  private val neighborGen = for {
    sim <- Gen.oneOf(Gen.choose(-1.0, 1.0), Gen.oneOf(0.5, 0.25)) // force ties
    id <- Gen.choose(0L, 50L)
    label <- Gen.choose(0, 9)
  } yield graft.functions.Neighbor(sim, id, label)

  property("topKNeighbors: reduce/merge at any split equals global sort-take") =
    Prop.forAll(Gen.listOf(neighborGen), Gen.choose(1, 8), Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new graft.functions.TopKNeighbors(k)
      val expected = xs.sortBy(n => (-n.sim, n.cId, n.label)).take(k)
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      direct == expected && merged == expected
    }

  // clusters of near-duplicate 16-bit signatures: a base plus variants at
  // hamming distance 0..5 — the distribution the banding must not miss on
  private val sigClusterGen = for {
    base <- Gen.choose(0L, 65535L)
    nVar <- Gen.choose(0, 3)
    variants <- Gen.listOfN(nVar, for {
      k <- Gen.choose(0, 5)
      bits <- Gen.listOfN(k, Gen.choose(0, 15))
    } yield bits.foldLeft(base)((s, b) => s ^ (1L << b)))
  } yield base :: variants

  property("simhash 4x4 banding covers EVERY hamming<=3 pair (pigeonhole)") =
    Prop.forAll(Gen.listOf(sigClusterGen)) { clusters =>
      val ids = clusters.flatten.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      def bandV(s: Long, j: Int): Long = (s >> (4 * j)) & 15L
      val banded = (for {
        (ai, sa) <- ids; (bi, sb) <- ids if ai < bi
        if (0 until 4).exists(j => bandV(sa, j) == bandV(sb, j)) // candidate
        if java.lang.Long.bitCount(sa ^ sb) <= 3                 // verify
      } yield (ai, bi)).toSet
      val brute = (for {
        (ai, sa) <- ids; (bi, sb) <- ids if ai < bi
        if java.lang.Long.bitCount(sa ^ sb) <= 3
      } yield (ai, bi)).toSet
      banded == brute
    }

  property("measurementXml: render -> parse round-trips rows incl. nulls") =
    Prop.forAll(Gen.nonEmptyListOf(measRow)) { rows =>
      // render groups by dn and sorts by ts; compare as multisets
      val counters = Seq("kpi_a", "kpi_b")
      val xml = MeasurementXml.render(rows, counters)
      val back = MeasurementXml.parseFile(xml, counters).toList
      back.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap ==
        rows.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    }
}
