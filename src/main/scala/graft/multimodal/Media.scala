package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * partition-wise batch pipeline.
  *
  * The actual media decode is STUBBED (`decodeStub`): this container has no
  * image/audio codecs (offline — SURVEY.md §0), so it derives deterministic
  * pseudo-metadata from the bytes. Everything around the stub is the real
  * production shape: explicit output schema, `mapPartitions` with bounded
  * batching (so a real decoder can amortize model/codec init per batch and
  * memory stays bounded), and per-row feature vectors computed from the
  * raw bytes (a 16-bin byte histogram — genuinely computed, not faked).
  *
  * At scale this runs embarrassingly parallel: no shuffle is introduced —
  * the stage pipelines onto the scan.
  */
object Media {

  /** Deterministic stand-in for a real media decoder. A real implementation
    * replaces ONLY this function (bytes => metadata). */
  def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    val n = bytes.length
    val h = java.util.Arrays.hashCode(bytes)
    val format = (math.floorMod(h, 3): @unchecked) match {
      case 0 => "png"
      case 1 => "jpeg"
      case 2 => "webp"
    }
    // pseudo-dimensions derived from content, stable across runs
    (format, 16 + math.floorMod(h >> 2, 1024), 16 + math.floorMod(h >> 12, 1024))
  }

  /** 16-bin normalized byte histogram — the feature-extraction stage. */
  def byteHistogram(bytes: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { bins(j) /= bytes.length; j += 1 }
    }
    bins
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Deterministic stand-in for a real resize: byte-stride subsampling to
    * a target payload size. A real implementation replaces ONLY this
    * kernel (bytes => resized bytes); the column plumbing stays. */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (bytes.length <= targetBytes) bytes
    else {
      val out = new Array[Byte](targetBytes)
      val stride = bytes.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) { out(i) = bytes((i * stride).toInt); i += 1 }
      out
    }
  }

  /** Resize the binary payload of `binCol` in place (same row count, new
    * `resized` column + its length) — the thumbnailing stage shape. */
  def resize(df: DataFrame, binCol: String, targetBytes: Int = 4096): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    require(inSchema(binIdx).dataType == BinaryType, s"$binCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_bytes", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val r = resizeStub(b, targetBytes)
        Row.fromSeq(row.toSeq :+ r :+ r.length)
      }
    }(enc)
  }

  /** Sample "frames" from a binary container: the payload is chunked into
    * fixed-size frames and every `every`-th frame is emitted as its own
    * row with per-frame features — the one-row-to-many-frames explode that
    * real video sampling produces. A real implementation replaces only the
    * chunking with a demuxer; schema, fan-out and feature plumbing stay. */
  def frameSample(df: DataFrame, binCol: String,
                  frameBytes: Int = 256, every: Int = 2): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    require(inSchema(binIdx).dataType == BinaryType, s"$binCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_features", ArrayType(DoubleType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val b = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = (b.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(
            b, f * frameBytes, math.min((f + 1) * frameBytes, b.length))
          Row.fromSeq(row.toSeq :+ f :+ byteHistogram(frame).toSeq)
        }
      }
    }(enc)
  }

  /** Decode + feature-extract a binary column. Input: any DataFrame with a
    * `BinaryType` column `binCol`. Output: input columns + `media` struct +
    * `features` array<double>, produced partition-wise in batches of
    * `batchSize` rows. */
  def extractFeatures(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    require(inSchema(binIdx).dataType == BinaryType, s"$binCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("media", metaSchema),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real decoder initializes codec/model state here
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val (fmt, w, h) = decodeStub(b)
          Row.fromSeq(row.toSeq
            :+ Row(fmt, w, h, b.length.toLong)
            :+ byteHistogram(b).toSeq)
        }
      }
    }(enc)
  }
}
