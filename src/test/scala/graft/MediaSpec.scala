package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType}

import graft.multimodal.Media

/** Multimodal binary-column plumbing: schema, batch shape, determinism, and
  * the feature stage's arithmetic (the decode itself is a documented stub —
  * SURVEY.md §0 offline container). */
class MediaSpec extends SparkSpec {

  private def withPayload = Tables.documents(spark, sf0001)
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("extractFeatures appends media struct + features without shuffling") {
    val out = Media.extractFeatures(withPayload, "payload")
    assert(out.schema("payload").dataType == BinaryType)
    assert(out.schema("media").dataType == Media.metaSchema)
    assert(out.schema("features").dataType == ArrayType(DoubleType, containsNull = false))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature extraction must not shuffle:\n$plan")
    assert(out.count() == withPayload.count())
  }

  test("byte histogram is normalized and deterministic") {
    val rows = Media.extractFeatures(withPayload, "payload", batchSize = 7)
      .select(col("doc_id"), col("features"), col("media.n_bytes"))
      .collect()
    rows.foreach { r =>
      val hist = r.getSeq[Double](1)
      assert(hist.size == 16)
      assert(math.abs(hist.sum - 1.0) < 1e-9, s"doc ${r.getLong(0)}: ${hist.sum}")
      assert(r.getLong(2) > 0)
    }
    // second run produces identical features (stub is deterministic)
    val again = Media.extractFeatures(withPayload, "payload")
      .select("doc_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Double](1)))
  }

  test("resize bounds the payload and keeps row count; frameSample fans out by chunk geometry") {
    val resized = Media.resize(withPayload, "payload", targetBytes = 64)
    assert(resized.count() == withPayload.count())
    resized.select("resized_bytes").collect().foreach(r => assert(r.getInt(0) <= 64))

    val frames = Media.frameSample(withPayload, "payload", frameBytes = 100, every = 2)
    val got = frames.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = withPayload
      .select(col("doc_id"), length(col("payload")).as("n"))
      .collect().map { r =>
        val nFrames = (r.getInt(1) + 99) / 100
        r.getLong(0) -> ((nFrames + 1) / 2).toLong // every 2nd frame, starting at 0
      }.toMap
    assert(got == expected)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "frame sampling must not shuffle")
  }

  test("rejects a non-binary column with a clear error") {
    val ex = intercept[IllegalArgumentException] {
      Media.extractFeatures(Tables.documents(spark, sf0001), "text")
    }
    assert(ex.getMessage.contains("binary"))
  }

  test("llm_media_dedup matches a driver signature-bucket recompute; corpus is ASCII") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    // the oracle recomputes byte histograms from CODEPOINTS — valid only
    // while chars ≡ UTF-8 bytes, so pin the precondition explicitly
    docs.foreach { case (id, t) =>
      assert(t.forall(_ < 128), s"doc $id is not pure ASCII — oracle precondition broken")
    }
    def sig(t: String): String = {
      val bytes = t.getBytes("UTF-8")
      Media.byteHistogram(bytes).map(f => math.floor(f * 1000).toLong).mkString(",")
    }
    def md5hex(s2: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s2.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expect = docs.map { case (id, t) => (sig(t), id, md5hex(t)) }
      .groupBy(_._1).filter(_._2.length >= 2).map { case (sg, ms) =>
        md5hex(sg) -> (ms.length.toLong, ms.map(_._3).distinct.length.toLong,
          ms.map(_._2).min)
      }
    val got = SparkEntry.queries("llm_media_dedup")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty, "no signature collisions — key exercises nothing")
    // on this corpus collisions are genuine near-dups (distinct payloads)
    assert(got.values.exists(v => v._2 > 1), "no distinct-payload bucket in fixture")
  }
}
