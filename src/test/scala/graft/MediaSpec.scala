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

  test("rejects a non-binary column with a clear error") {
    val ex = intercept[IllegalArgumentException] {
      Media.extractFeatures(Tables.documents(spark, sf0001), "text")
    }
    assert(ex.getMessage.contains("binary"))
  }
}
