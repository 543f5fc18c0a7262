package graft

import org.apache.spark.sql.functions._

import graft.ops.SimHash

/** 64-bit SimHash (the production-width variant of the 16-bit keys):
  * signature determinism and the 4×16-bit banding's full-recall guarantee
  * at hamming ≤ 3, against driver-side brute force. */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  // overlapping doc families so near-identical signature pairs exist
  private def corpus = {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 120).map(i => f"w$i%03d")
    (0 until 80).map { i =>
      val base = vocab.slice((i % 5) * 24, (i % 5) * 24 + 22)
      val noise = Seq.fill(2)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, rnd.shuffle(base ++ noise).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("banded pairs equal brute-force hamming<=3 (pigeonhole at 64 bits)") {
    val docs = corpus
    val sigs = SimHash.signatures(docs)
    val sigMap = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigMap.size == 80)
    val expected = (for {
      (ai, sa) <- sigMap; (bi, sb) <- sigMap if ai < bi
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ai, bi, h)).toSet
    val got = SimHash.bandedPairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "fixture must contain near-identical signatures")
  }

  test("signatures are deterministic and use the full 64-bit range") {
    val docs = corpus
    val a = SimHash.signatures(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SimHash.signatures(docs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "partitioning must not change signatures")
    // the high 32 bits actually carry votes (a 16-bit-wide bug would zero them)
    assert(a.values.exists(s => (s >>> 32) != 0L))
    // near-identical docs (same family) land within hamming 3; different
    // families land far apart — the sketch separates
    val fam0 = a.collect { case (k, v) if k % 5 == 0 => v }.toSeq
    val fam1 = a.collect { case (k, v) if k % 5 == 1 => v }.toSeq
    assert(java.lang.Long.bitCount(fam0.head ^ fam1.head) > 10)
  }
}
