package graft

import org.apache.spark.sql.functions._

import graft.ops.Winnow

/** Winnowing's paper guarantees, checked on synthetic corpora: the match
  * guarantee (shared runs >= k+w-1 tokens always share a fingerprint), the
  * ~2/(w+1) selection density, and the short-doc degradations. Also pins
  * the win_ewma fold against a driver-side reference implementation.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fpSets(docs: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
    Winnow.fingerprints(docs).collect()
      .groupBy(_.getLong(0)).map { case (id, rows) => id -> rows.map(_.getString(1)).toSet }

  test("match guarantee: docs sharing a >= k+w-1 token run share a fingerprint") {
    val rnd = new scala.util.Random(11)
    def randToks(n: Int, tag: String) = Seq.fill(n)(s"$tag${rnd.nextInt(5000)}")
    // 20 pairs: distinct random prefixes/suffixes around a planted common
    // run of exactly k+w-1 = 6 tokens (the minimum the guarantee covers)
    val docs = (0 until 20).flatMap { i =>
      val common = randToks(6, s"c$i")
      Seq((2L * i, (randToks(30, s"a$i") ++ common ++ randToks(30, s"b$i")).mkString(" ")),
        (2L * i + 1, (randToks(25, s"x$i") ++ common ++ randToks(35, s"y$i")).mkString(" ")))
    }.toDF("doc_id", "text")
    val sets = fpSets(docs)
    (0 until 20).foreach { i =>
      val shared = sets(2L * i).intersect(sets(2L * i + 1))
      assert(shared.nonEmpty, s"pair $i with a planted 6-token run shares no fingerprint")
    }
  }

  test("selection density lands near 2/(w+1) on random text") {
    val rnd = new scala.util.Random(5)
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq.fill(400)(s"t${rnd.nextInt(100000)}").mkString(" "))
    }.toDF("doc_id", "text")
    val nShingles = 30 * (400 - 2)
    val nSelected = Winnow.fingerprints(docs).count()
    val density = nSelected.toDouble / nShingles
    // paper expectation 2/(w+1) = 0.4 for w=4 (distinct-set counting and
    // runs of a shared min pull it slightly below); generous band
    assert(density > 0.2 && density < 0.55, s"density $density out of band")
  }

  test("short docs degrade to single-min then whole-text md5") {
    val docs = Seq(
      (1L, "a b c d e f"), // 4 shingles = w -> exactly one fp (global min)
      (2L, "a b"), // < k tokens -> whole-text md5
      (3L, "")
    ).toDF("doc_id", "text")
    val sets = fpSets(docs)
    assert(sets(1L).size == 1)
    assert(sets(2L) == Set(org.apache.commons.codec.digest.DigestUtils.md5Hex("a b")))
    assert(sets(3L) == Set(org.apache.commons.codec.digest.DigestUtils.md5Hex("")))
  }

  test("win_ewma equals a driver-side sequential fold (16-sample truncation)") {
    val got = SparkEntry.queries("win_ewma")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    val events = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(_._1).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r =>
        ((r._2.getTime / 1000) * 1000000L + r._2.getNanos / 1000, r._3))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 15), i + 1).map(_._4)
        val ewma = frame.tail.foldLeft(frame.head)((acc, x) => 0.25 * x + 0.75 * acc)
        ordered(i)._3 -> math.floor(ewma * 10000) / 10000
      }
    }
    assert(got.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(got(id) == v, s"event $id: got ${got(id)} expected $v")
    }
  }
}
