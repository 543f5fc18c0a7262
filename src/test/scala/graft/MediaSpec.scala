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

  test("BMP codec: encode writes a real 24-bit bottom-up padded file, decode round-trips positions") {
    // 3×2 grayscale, all six pixels DISTINCT so any padding/row/channel
    // misread changes some position. Row-major top-down input.
    val gray = Array[Byte](10, 20, 30, 40, 50, 60)
    val bmp = Media.encodeBmp(3, 2, gray)
    // header facts: signature, 54-byte pixel offset, 24 bpp, BI_RGB,
    // row size 3·3 = 9 padded to 12 ⇒ file = 54 + 2·12 = 78
    assert(bmp.length == 78)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    assert((bmp(10) & 0xff) == 54 && (bmp(28) & 0xff) == 24)
    // bottom-up: file row 0 = image row 1 (40, 50, 60), BGR = same gray
    assert((bmp(54) & 0xff) == 40 && (bmp(57) & 0xff) == 50 && (bmp(60) & 0xff) == 60)
    // padding bytes at the end of each 12-byte row stay zero
    assert(bmp(63) == 0 && bmp(64) == 0 && bmp(65) == 0)
    // image row 0 lives in file row 1
    assert((bmp(66) & 0xff) == 10 && (bmp(69) & 0xff) == 20 && (bmp(72) & 0xff) == 30)
    val (w, h, px) = Media.decodeBmp(bmp)
    assert(w == 3 && h == 2)
    // decoded top-down row-major r-channel equals the input exactly
    assert((0 until 6).map(i => px(i * 3)) == gray.map(_ & 0xff).toSeq)
    // r = g = b for a grayscale encode
    assert((0 until 6).forall(i => px(i * 3) == px(i * 3 + 1) && px(i * 3) == px(i * 3 + 2)))
  }

  test("BMP codec: negative-height top-down variant decodes without the flip") {
    val gray = Array[Byte](1, 2, 3, 4, 5, 6)
    val bmp = Media.encodeBmp(3, 2, gray)
    // rewrite height to -2 and swap the two pixel rows: same logical image
    val td = bmp.clone()
    val neg = -2
    td(22) = (neg & 0xff).toByte; td(23) = ((neg >> 8) & 0xff).toByte
    td(24) = ((neg >> 16) & 0xff).toByte; td(25) = ((neg >> 24) & 0xff).toByte
    for (i <- 0 until 12) { val t = td(54 + i); td(54 + i) = td(66 + i); td(66 + i) = t }
    val (w, h, px) = Media.decodeBmp(td)
    assert(w == 3 && h == 2)
    assert((0 until 6).map(i => px(i * 3)) == gray.map(_ & 0xff).toSeq)
  }

  test("BMP codec: rejects non-BMP, compressed, and non-24-bit payloads") {
    intercept[IllegalArgumentException](Media.decodeBmp(Array[Byte](1, 2, 3)))
    val ok = Media.encodeBmp(2, 2, Array[Byte](1, 2, 3, 4))
    val badBpp = ok.clone(); badBpp(28) = 8
    intercept[IllegalArgumentException](Media.decodeBmp(badBpp))
    val badComp = ok.clone(); badComp(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Media.decodeBmp(badComp))
    val truncated = java.util.Arrays.copyOfRange(ok, 0, ok.length - 4)
    intercept[IllegalArgumentException](Media.decodeBmp(truncated))
  }

  test("llm_media_decode matches a driver md5-byte recompute at sf0.001") {
    def md5bytes(s2: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(s2.getBytes("UTF-8"))
    val expect = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0)).map { id =>
        val v = md5bytes(id.toString).take(15).map(_ & 0xff)
        id -> (v.sum.toLong, v.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum,
          v.min, v.max)
      }.toMap
    val got = SparkEntry.queries("llm_media_decode")(spark, sf0001).collect().map { r =>
      assert(r.getInt(1) == 3 && r.getInt(2) == 5 && r.getInt(3) == 114)
      r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7))
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("PNG codec: every filter type 0-4 round-trips a gradient exactly") {
    // 4×6: values with strong horizontal AND vertical structure so each
    // filter produces distinct residuals; one fixed filter per image
    val gray = Array.tabulate(24)(i => ((i % 4) * 50 + (i / 4) * 7).toByte)
    (0 to 4).foreach { ft =>
      val png = Media.encodePng(4, 6, gray, filterForRow = _ => ft)
      val (w, h, px) = Media.decodePng(png)
      assert(w == 4 && h == 6, s"filter $ft: wrong dims")
      assert(px.toSeq == gray.map(_ & 0xff).toSeq, s"filter $ft: pixel mismatch")
    }
    // the cycling form the key uses (all five filters in one image)
    val png = Media.encodePng(4, 6, gray, filterForRow = r => r % 5)
    assert(Media.decodePng(png)._3.toSeq == gray.map(_ & 0xff).toSeq)
  }

  test("PNG codec: header facts, multi-IDAT concatenation, ImageIO cross-decode") {
    val gray = Array.tabulate(15)(i => (17 * i + 3).toByte)
    val png = Media.encodePng(3, 5, gray, filterForRow = r => r % 5)
    // signature + IHDR facts at fixed offsets (13-byte IHDR first chunk)
    assert((png(0) & 0xff) == 137 && png(1) == 'P'.toByte)
    assert(new String(png, 12, 4, "US-ASCII") == "IHDR")
    assert(png(24) == 8 && png(25) == 0, "bit depth 8, color type 0 (gray)")
    // multi-IDAT: 5-byte chunks force several; decoder must concatenate
    val multi = Media.encodePng(3, 5, gray, filterForRow = r => r % 5, idatChunkSize = 5)
    assert(multi.length > png.length, "chunk split should add framing overhead")
    assert(Media.decodePng(multi)._3.toSeq == gray.map(_ & 0xff).toSeq)
    // independent decoder: the JDK's ImageIO must read our file and see
    // the exact pixels — proves spec conformance, not just self-inverse
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse our PNG")
    assert(img.getWidth == 3 && img.getHeight == 5)
    val viaImageIO = for (r <- 0 until 5; c <- 0 until 3)
      yield img.getRaster.getSample(c, r, 0)
    assert(viaImageIO == gray.map(_ & 0xff).toSeq)
  }

  test("PNG codec: rejects bad signature, corrupted CRC, and unsupported color type") {
    intercept[IllegalArgumentException](Media.decodePng(Array[Byte](1, 2, 3)))
    val ok = Media.encodePng(2, 2, Array[Byte](9, 8, 7, 6))
    // flip one bit inside the IHDR data -> CRC must catch it
    val badCrc = ok.clone(); badCrc(17) = (badCrc(17) ^ 1).toByte
    intercept[IllegalArgumentException](Media.decodePng(badCrc))
    // declare RGB (color type 2) with the CRC recomputed -> explicit reject
    val rgb = ok.clone(); rgb(25) = 2
    val crc = new java.util.zip.CRC32
    crc.update(rgb, 12, 4 + 13)
    val cv = crc.getValue.toInt
    rgb(29) = ((cv >> 24) & 0xff).toByte; rgb(30) = ((cv >> 16) & 0xff).toByte
    rgb(31) = ((cv >> 8) & 0xff).toByte; rgb(32) = (cv & 0xff).toByte
    intercept[IllegalArgumentException](Media.decodePng(rgb))
    // truncated IDAT stream
    intercept[IllegalArgumentException](
      Media.decodePng(java.util.Arrays.copyOfRange(ok, 0, ok.length - 13)))
  }

  test("llm_media_ahash matches a driver recompute; buckets are consistent") {
    def md5bytes(s2: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(s2.getBytes("UTF-8"))
    def ahash(id: Long): (Long, Int) = {
      val v = md5bytes(id.toString).take(15).map(_ & 0xff)
      val sum = v.map(_.toLong).sum
      val bits = v.zipWithIndex.filter { case (x, _) => x.toLong * 15 > sum }
      (bits.map { case (_, i) => 1L << i }.sum, bits.length)
    }
    val rows = SparkEntry.queries("llm_media_ahash")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, b) = ahash(r.getLong(0))
      assert(r.getLong(1) == h && r.getInt(2) == b, s"doc ${r.getLong(0)} hash mismatch")
    }
    // bucket sizes are the true per-hash cardinalities
    val byHash = rows.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getLong(3) == byHash(r.getLong(1))))
  }

  test("llm_media_decode_png matches a driver md5-byte recompute at sf0.001") {
    def md5bytes(s2: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(s2.getBytes("UTF-8"))
    val expect = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0)).map { id =>
        val v = md5bytes(id.toString).take(15).map(_ & 0xff)
        id -> (v.sum.toLong, v.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum,
          v.min, v.max)
      }.toMap
    val got = SparkEntry.queries("llm_media_decode_png")(spark, sf0001).collect().map { r =>
      assert(r.getInt(1) == 3 && r.getInt(2) == 5 && r.getInt(3) == 20)
      r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7))
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  /** Driver-side pHash recompute: same quantized separable DCT as
    * Media.pngPHash, straight off the raw gray bytes (no codec) — the
    * codec is identity on pixel values, so equality also re-proves the
    * PNG round-trip at 16x16. */
  private def phashOf(gray: Array[Byte]): (Long, Int) = {
    val cq = Media.phashCosQ(16, 8)
    val px = gray.map(_ & 0xff)
    val rowSum = Array.tabulate(8, 16) { (u, y) =>
      (0 until 16).map(x => px(y * 16 + x).toLong * cq(u)(x)).sum }
    val coef = Array.tabulate(8, 8) { (u, v) =>
      (0 until 16).map(y => rowSum(u)(y) * cq(v)(y)).sum }
    val nonDc = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
      yield coef(u)(v)).sorted
    val med = nonDc(31)
    val bits = for (u <- 0 until 8; v <- 0 until 8
                    if (u != 0 || v != 0) && coef(u)(v) > med) yield u * 8 + v - 1
    (bits.map(1L << _).sum, bits.length)
  }

  test("llm_media_phash matches a driver recompute; ~half the 63 bits set") {
    import spark.implicits._
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s2.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = SparkEntry.queries("llm_media_phash")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val gray = (0 until 16).flatMap(j =>
        md5hex(s"$id:p$j").grouped(2).map(Integer.parseInt(_, 16).toByte)).toArray
      val (h, b) = phashOf(gray)
      assert(r.getLong(1) == h && r.getInt(2) == b, s"doc $id phash mismatch")
    }
    // median threshold: 31 strict-above bits unless ties collapse some
    rows.foreach(r => assert(r.getInt(2) >= 25 && r.getInt(2) <= 31, r.toString))
    val byHash = rows.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getLong(3) == byHash(r.getLong(1))))
  }

  test("pHash survives an illumination gradient that aHash scatters (the robustness contract)") {
    import spark.implicits._
    // base: md5-derived pseudo-random 16x16; damaged: a +-2(x-8) linear
    // illumination gradient (vignette/lighting change — the classic
    // near-duplicate). The gradient shifts many pixels relative to the
    // GLOBAL mean (aHash bits scatter) but only perturbs the lowest
    // x-frequency DCT coefficients, far from the median threshold
    // (pHash identical).
    val base = (0 until 16).flatMap { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"fixture:$j".getBytes("UTF-8"))
    }.toArray
    val damaged = Array.tabulate(256) { i =>
      val x = i % 16
      math.min(255, math.max(0, (base(i) & 0xff) + 2 * (x - 8))).toByte
    }
    // aHash-style mean-test bit set (computed at 16x16 here — the library
    // bmpAHash is capped at 63 px, so this asserts the ALGORITHM relation)
    def ahashBits(g: Array[Byte]): Set[Int] = {
      val px = g.map(_ & 0xff); val sum = px.map(_.toLong).sum
      (0 until 256).filter(i => px(i).toLong * 256 > sum).toSet
    }
    val aBase = ahashBits(base); val aDam = ahashBits(damaged)
    val aHamming = (aBase diff aDam).size + (aDam diff aBase).size
    assert(aHamming >= 3, s"fixture must scatter aHash bits, moved $aHamming")
    val df = Seq((1L, base), (2L, damaged)).toDF("doc_id", "gray")
    val hashed = Media.pngPHash(df, "gray", 16, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hashed(1L) == hashed(2L),
      f"pHash should collide under the gradient: ${hashed(1L)}%x vs ${hashed(2L)}%x")
  }

  private def md5Gray(seed: String, n: Int): Array[Byte] =
    (0 until (n + 15) / 16).flatMap { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8"))
    }.take(n).toArray

  private def imageIoDecode(jpeg: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    val (w, h) = (img.getWidth, img.getHeight)
    val px = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, px)
  }

  test("JPEG codec: flat blocks at quality 1.0 round-trip EXACTLY (the oracle property)") {
    val blocks = Array(63, 131, 255, 0)
    val gray = Media.flatBlocks16(blocks)
    val (w, h, px) = Media.decodeJpeg(Media.encodeJpegGray(16, 16, gray, 1.0f))
    assert(w == 16 && h == 16)
    (0 until 256).foreach { i =>
      assert(px(i) == (gray(i) & 0xff), s"pixel $i: ${px(i)} vs ${gray(i) & 0xff}")
    }
  }

  test("JPEG codec: ImageIO cross-conformance on non-flat images, multiple MCUs and qualities") {
    // 24x16 forces a 3x2 MCU grid (block placement on the hot path);
    // 16x16 covers the square case. ImageIO's libjpeg-style integer IDCT
    // and our double-precision IDCT are both spec-compliant but not
    // identical — JPEG pins no exact IDCT — so parity is within 1 gray
    // level; at quality 1.0 the residual is IDCT rounding only.
    for ((w, h) <- Seq((16, 16), (24, 16)); q <- Seq(1.0f, 0.75f)) {
      val gray = md5Gray(s"jpeg:$w:$h", w * h)
      val jpeg = Media.encodeJpegGray(w, h, gray, q)
      val (dw, dh, ours) = Media.decodeJpeg(jpeg)
      val (iw, ih, ref) = imageIoDecode(jpeg)
      assert((dw, dh) == (w, h) && (iw, ih) == (w, h))
      val maxDiff = (0 until w * h).map(i => math.abs(ours(i) - ref(i))).max
      assert(maxDiff <= 1,
        s"decoder disagrees with ImageIO by $maxDiff gray levels at ${w}x$h q=$q")
    }
  }

  test("JPEG codec: DRI/RSTn restart markers resync and reset the DC predictor") {
    // hand-assembled baseline stream: 16x8 (two MCUs), all-1 quant, DRI=1,
    // so a RST0 sits between the blocks and the second DC codes from a
    // RESET predictor — a decoder that keeps the old predictor reads the
    // wrong value; one that doesn't byte-align desyncs entirely.
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT tq=0, all 1s
    seg(0xc0, Array(8, 0, 8, 0, 16, 1, 0x01, 0x11, 0x00)) // SOF0 8x16, 1 comp
    // DC table 0: two codes of length 2 -> syms (8, 9); AC table 0: one
    // code of length 1 -> sym 0x00 (EOB)
    seg(0xc4, Array(0x00, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 9))
    seg(0xc4, Array(0x10, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x00))
    seg(0xdd, Array(0, 1)) // DRI = 1 MCU
    seg(0xda, Array(1, 0x01, 0x00, 0, 63, 0)) // SOS
    // entropy: block1 v=100 -> DC diff -224: cat 8 (code '00'), bits
    // -224 + 255 = 31 -> 00011111; EOB '0'. 11 bits, pad to 16 with 1s.
    // bits: 00 00011111 0 11111 -> bytes 0x07 0xDF
    out.write(0x07); out.write(0xdf)
    out.write(0xff); out.write(0xd0) // RST0
    // block2 v=180 -> predictor RESET, DC diff 416: cat 9 (code '01'),
    // bits 110100000; EOB '0'. 12 bits pad to 16: 01 110100000 0 1111
    // -> 0111 0100 0000 1111 -> 0x74 0x0F
    out.write(0x74); out.write(0x0f)
    out.write(0xff); out.write(0xd9) // EOI
    val (w, h, px) = Media.decodeJpeg(out.toByteArray)
    assert(w == 16 && h == 8)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        assert(px(y * 16 + x) == 100, s"block1 ($x,$y) = ${px(y * 16 + x)}")
        assert(px(y * 16 + 8 + x) == 180, s"block2 ($x,$y) = ${px(y * 16 + 8 + x)}")
      }
    }
  }

  test("JPEG codec: rejects progressive, color, and non-JFIF payloads loudly") {
    intercept[IllegalArgumentException](Media.decodeJpeg(Array[Byte](1, 2, 3, 4, 5)))
    // progressive (SOF2)
    val prog = new java.io.ByteArrayOutputStream()
    prog.write(0xff); prog.write(0xd8)
    prog.write(0xff); prog.write(0xc2); prog.write(0); prog.write(11)
    Seq(8, 0, 8, 0, 8, 1, 0x01, 0x11, 0x00).foreach(prog.write)
    val e1 = intercept[IllegalArgumentException](Media.decodeJpeg(prog.toByteArray))
    assert(e1.getMessage.contains("FFC2"))
    // 3-component color via ImageIO
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val e2 = intercept[IllegalArgumentException](Media.decodeJpeg(bos.toByteArray))
    assert(e2.getMessage.contains("single-component"))
  }

  test("JPEG/PNG cross-format pHash: lossless fixtures identical; lossy re-encode within 2 bits") {
    import spark.implicits._
    // flat-block fixture: both codecs decode exactly -> hashes identical
    val df = Seq((1L, Seq(40, 200, 120, 88)), (2L, Seq(10, 10, 250, 30)))
      .toDF("doc_id", "blocks")
    Media.jpegPngCrossPHash(df, "blocks").collect().foreach { r =>
      assert(r.getAs[Int]("hamming") == 0,
        s"flat-block cross-format hash must match: $r")
    }
    // the production claim: the SAME non-trivial photo stored as PNG by
    // one pipeline and as LOSSY JPEG by another still lands in the same
    // dedup bucket (pHash distance <= 2)
    val base = md5Gray("crossfmt", 256)
    val cq = Media.phashCosQ(16, 8)
    val (_, _, pxP) = Media.decodePng(Media.encodePng(16, 16, base, r => r % 5))
    val (_, _, pxJ) = Media.decodeJpeg(Media.encodeJpegGray(16, 16, base, 0.9f))
    val (hP, _) = Media.phashOfPixels(pxP, 16, 16, 8, cq, cq)
    val (hJ, _) = Media.phashOfPixels(pxJ, 16, 16, 8, cq, cq)
    val d = java.lang.Long.bitCount(hP ^ hJ)
    assert(d <= 2, f"cross-format pHash distance $d: $hP%x vs $hJ%x")
  }
}
