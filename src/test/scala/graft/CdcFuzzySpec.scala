package graft

import org.apache.spark.sql.functions._

/** The two r7 similarity keys whose oracles are exact but whose DESIGN
  * properties need direct evidence: `llm_cdc_chunks` (content-defined
  * chunking must survive a prefix shift — the whole point vs fixed-size
  * blocks) and `join_fuzzy_blocked` (deletion-neighborhood blocking must
  * find exactly the brute-force levenshtein ≤ 1 pairs — blocking is a
  * candidate OPTIMIZATION, never a recall trade). */
class CdcFuzzySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ~1.3 kB pseudo-random text (md5 chain — no RNG). */
  private def synthText: String =
    (1 to 40).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"cdc-fixture-$i".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }.mkString

  test("llm_cdc_chunks: a prefix insertion shifts boundaries WITH the content") {
    val base = synthText
    val docs = Seq((1L, base), (2L, "INSERTED-PREFIX-" + base)).toDF("doc_id", "text")
    val chunks = graft.queries.Llm.cdcChunkTable(docs)
      .select("chunk_hash", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reconstruct each doc's chunk multiset via the same table filtered per doc
    val perDoc = graft.queries.Llm.cdcChunkTable(docs.where(col("doc_id") === 1L))
      .select("chunk_hash").collect().map(_.getString(0))
    assert(perDoc.length >= 10, s"fixture too short: only ${perDoc.length} chunks")
    // every chunk of doc1 except (at most) its first must reappear in doc2:
    // windows fully inside the shared suffix hash identically, so all cut
    // positions realign after the prefix — that is the CDC property
    val shared = perDoc.count(h => chunks.get(h).contains(2L))
    assert(shared >= perDoc.length - 1,
      s"only $shared/${perDoc.length} chunks survived the prefix shift — chunking is not content-defined")
    // and a control: fixed-size 32-char blocks would misalign almost everywhere
    val blocks1 = base.grouped(32).toSeq
    val blocks2 = ("INSERTED-PREFIX-" + base).grouped(32).toSet
    val blockShared = blocks1.count(blocks2.contains)
    assert(blockShared <= blocks1.length / 2,
      "control failed: fixed blocks unexpectedly aligned — fixture no longer demonstrates the property")
  }

  test("llm_cdc_chunks: chunks concatenate back to the document exactly") {
    val docs = Seq((7L, synthText)).toDF("doc_id", "text")
    // group readout loses order, so re-derive segments via the helper's
    // contract: total chunk bytes must equal the document length and every
    // chunk must be a substring of the text
    val rows = graft.queries.Llm.cdcChunkTable(docs)
      .agg(sum(col("chunk_len") * col("n_occ")).as("bytes")).head()
    assert(rows.getLong(0) == synthText.length.toLong)
  }

  test("llm_dedup_cdc: flags the shifted near-dup that exact-hash dedup misses") {
    val base = synthText
    val docs = Seq(
      (1L, base),                                  // original
      (2L, "INSERTED-PREFIX-" + base),             // shifted near-dup
      (3L, synthText.reverse)                      // unrelated control
    ).toDF("doc_id", "text")
    val pairs = graft.queries.Llm.cdcContainmentPairs(docs)
      .select("a_id", "b_id", "containment_units").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the shifted pair must be flagged with high containment...
    assert(pairs.contains((1L, 2L)), s"shifted near-dup not flagged; pairs=$pairs")
    assert(pairs((1L, 2L)) >= 8000L,
      s"shifted near-dup containment ${pairs((1L, 2L))} < 80% — boundaries did not realign")
    // ...while exact doc-hash dedup sees three distinct documents
    assert(docs.select(md5(col("text"))).distinct().count() == 3)
    // and the unrelated doc pairs with nothing
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "control doc paired — containment gate too loose")
  }

  test("join_fuzzy_blocked equals driver brute-force levenshtein <= 1 at sf0.001") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && math.abs(na.length - nb.length) <= 1 && lev(na, nb) <= 1
    } yield (ka, kb, lev(na, nb).toLong)).toSet
    val got = SparkEntry.queries("join_fuzzy_blocked")(spark, sf0001)
      .select("cust_a", "cust_b", "lev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"blocked pairs ${got.size} != brute-force ${expect.size}")
    assert(expect.nonEmpty, "fixture produced no lev<=1 pairs — test is vacuous")
  }
}
