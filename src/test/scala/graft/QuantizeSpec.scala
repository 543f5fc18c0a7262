package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** int8 embedding quantization (`llm_embed_quantize`): lattice range,
  * the scalar-quantization error bound, zero-vector handling, and that
  * the dequantized corpus preserves nearest neighbors well enough to
  * serve as the ANN index representation. */
class QuantizeSpec extends SparkSpec {

  private def parsed(sf: String) =
    SparkEntry.queries("llm_embed_quantize")(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getDouble(1), r.getString(2).split(",").map(_.toInt))
      }

  test("codes stay in the int8 lattice and hit +/-127 at the per-vector max") {
    val rows = parsed(sf0001)
    assert(rows.length == 500)
    rows.foreach { case (id, _, q) =>
      assert(q.length == 64, s"vec $id: 64 dims")
      assert(q.forall(c => c >= -128 && c <= 127), s"vec $id codes out of range")
      // the max-|x| element quantizes to 127 (positive max) or -128..-127
      // (negative max floors to -127 exactly, or -128 never: |x|/amax <= 1)
      assert(q.exists(c => c == 127 || c == -127), s"vec $id never reaches full scale")
    }
  }

  test("dequantization error is bounded by one lattice step per element") {
    val src = Tables.embeddings(spark, sf0001).collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)
    }.toMap
    parsed(sf0001).foreach { case (id, _, q) =>
      val x = src(id)
      val amax = x.map(math.abs).max
      val step = amax / 127.0
      q.zip(x).zipWithIndex.foreach { case ((c, xi), i) =>
        assert(math.abs(c * step - xi) <= step + 1e-12,
          s"vec $id dim $i: |${c * step} - $xi| > step $step")
      }
    }
  }

  test("zero vectors quantize to all-zero codes with scale 0, no NaN") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = tmpDir("quant_zero")
    val rows = Seq(
      Row(1L, Array.fill(4)(0.0f).toSeq, 0),
      Row(2L, Seq(1.0f, -2.0f, 0.5f, 0.0f), 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("llm_embed_quantize")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(got(1L) == ((0.0, "0,0,0,0")))
    assert(got(2L)._2 == "63,-127,31,0")
  }

  test("dequantized corpus preserves exact nearest neighbors (top-1 recall)") {
    // Re-run the exact 1-NN search over the dequantized vectors and over
    // the originals; the int8 representation must keep recall high enough
    // to be the index-scan representation (full precision only re-ranks).
    val exact = graft.ops.Knn.topKCosine(Tables.embeddings(spark, sf0001), 1)
      .toDF().collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    val deq = SparkEntry.queries("llm_embed_quantize")(spark, sf0001)
      .select(col("vec_id"), col("scale_q"),
        split(col("q_int8"), ",").cast("array<int>").as("q"))
      .select(col("vec_id"),
        transform(col("q"), c => (c.cast("double") * col("scale_q") / 127.0d).cast("float"))
          .as("embedding"))
      .join(Tables.embeddings(spark, sf0001).select("vec_id", "label"), "vec_id")
      .select("vec_id", "embedding", "label")
    val approx = graft.ops.Knn.topKCosine(deq, 1)
      .toDF().collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    val hits = exact.count { case (q, nn) => approx.get(q).contains(nn) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.95, s"top-1 recall after int8 quantization: $recall")
  }
}
