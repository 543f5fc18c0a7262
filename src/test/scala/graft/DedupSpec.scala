package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** The multi-word mask path of the bitmask Jaccard dedup: the shared
  * testdata's vocabulary fits one word (31 tokens), so this suite builds a
  * synthetic corpus with >64 distinct tokens and checks the general path
  * against a driver-side brute-force Jaccard. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("multi-word mask path equals brute force on a 150-token vocabulary") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 150).map(i => f"tok$i%03d")
    // overlapping doc families so pairs above threshold actually exist
    val docs = (0 until 60).map { i =>
      val base = vocab.slice((i % 6) * 20, (i % 6) * 20 + 18)
      val noise = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, (rnd.shuffle(base ++ noise)).mkString(" "), if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")

    val got = Dedup.jaccardBitmask(spark, docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // brute force on the driver
    val sets = docs.collect().map(r => (r.getLong(0),
      r.getString(1).split(" ").filter(_.nonEmpty).toSet, r.getString(2)))
    val expected = (for {
      (ai, as_, al) <- sets; (bi, bs, bl) <- sets
      if al == bl && ai < bi
      j = jaccard(as_, bs) if j >= 0.5
    } yield (ai, bi) -> math.rint(j * 1e4) / 1e4).toMap

    assert(got.keySet == expected.keySet,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    expected.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, s"$k: ${got(k)} vs $j") }
    assert(expected.nonEmpty, "test corpus must produce similar pairs")
  }

  test("single-word fast path still serves the shared corpus") {
    // vocabulary 31 => single-long mask plan (no zip_with in the plan)
    val df = Dedup.jaccardBitmask(spark, Tables.documents(spark, sf0001), 0.5)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("zip_with"), "expected the single-word path")
    df.count() // executes
  }
}
