package graft.ops

import graft.SparkTestBase

/** Baseline-JPEG decoder (Multimodal.decodeJpeg) cross-validated against
  * an INDEPENDENT decoder — the JDK's ImageIO JPEG plugin — on streams
  * the JDK's own ENCODER produced at several sizes, qualities and
  * chroma-subsampling regimes. Dimensions must match exactly; mean luma
  * within IDCT/color-convert rounding (both decoders reconstruct the
  * same coefficients, then differ only in float rounding and in the
  * RGB→luma round-trip); dHash within a small Hamming distance (tie
  * cells can flip on ±1 luma differences). Progressive streams must be
  * rejected (→ documented stub fallback), not mis-decoded.
  */
class JpegSpec extends SparkTestBase {

  private def rgb(w: Int, h: Int)(px: (Int, Int) => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  private def gray(w: Int, h: Int)(px: (Int, Int) => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y))
    img
  }

  private def encode(img: java.awt.image.BufferedImage, quality: Float,
                     progressive: Boolean = false): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  private def mediaFile(b: Array[Byte]): Multimodal.MediaFile =
    Multimodal.MediaFile("mem://img.jpg",
      new java.sql.Timestamp(0L), b.length.toLong, b)

  /** reference luma stats from ImageIO's decode of the same bytes */
  private def reference(b: Array[Byte]): (Int, Int, Double, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    val (w, h) = (img.getWidth, img.getHeight)
    // single-channel: read the raster directly — getRGB would gamma-map
    // linear gray to sRGB and inflate the reference luma
    val grayDirect = img.getColorModel.getNumComponents == 1
    val sums = new Array[Double](72)
    val cnts = new Array[Long](72)
    var total = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val l =
        if (grayDirect) img.getRaster.getSample(x, y, 0) / 255.0
        else {
          val c = img.getRGB(x, y)
          (0.299 * ((c >> 16) & 0xff) + 0.587 * ((c >> 8) & 0xff) +
            0.114 * (c & 0xff)) / 255.0
        }
      total += l
      val cell = ((y.toLong * 8) / h).toInt * 9 + ((x.toLong * 9) / w).toInt
      sums(cell) += l; cnts(cell) += 1
    }
    var hash = 0L
    val cell = Array.tabulate(72)(i =>
      if (cnts(i) == 0) 0.0 else sums(i) / cnts(i))
    for (r <- 0 until 8; c <- 0 until 8)
      if (cell(r * 9 + c + 1) > cell(r * 9 + c)) hash |= 1L << (r * 8 + c)
    (w, h, total / (w * h), hash)
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  private def checkAgainstImageIO(b: Array[Byte], label: String): Unit = {
    val got = Multimodal.decodeJpeg(mediaFile(b))
    assert(got.isDefined, s"$label: decoder rejected a baseline stream")
    val f = got.get
    val (rw, rh, rl, rdh) = reference(b)
    assert(f.width == rw && f.height == rh, s"$label: dims")
    assert(f.n_frames == 1, label)
    assert(math.abs(f.mean_luma - rl) < 0.01,
      s"$label: luma ${f.mean_luma} vs ImageIO $rl")
    assert(hamming(f.dhash, rdh) <= 4,
      s"$label: dhash ${f.dhash.toHexString} vs ${rdh.toHexString} " +
        s"(hamming ${hamming(f.dhash, rdh)})")
  }

  test("color JPEG, default subsampling, several sizes and qualities") {
    // non-multiple-of-MCU dims exercise edge-block clipping; the pattern
    // mixes gradients and blocks so DC and AC paths both carry signal
    for ((w, h) <- Seq((64, 48), (37, 23), (129, 66));
         q <- Seq(0.5f, 0.85f, 0.97f)) {
      val img = rgb(w, h) { (x, y) =>
        val r = (x * 255 / math.max(1, w - 1))
        val g = (y * 255 / math.max(1, h - 1))
        val bl = if (((x / 8) + (y / 8)) % 2 == 0) 40 else 215
        (r << 16) | (g << 8) | bl
      }
      checkAgainstImageIO(encode(img, q), s"rgb $w x $h q=$q")
    }
  }

  test("grayscale single-component JPEG") {
    val img = gray(50, 31)((x, y) => (x * 7 + y * 11) % 256)
    checkAgainstImageIO(encode(img, 0.8f), "gray 50x31")
  }

  test("high-frequency image (dense AC coefficients, ZRL paths)") {
    val img = gray(40, 40)((x, y) => if ((x + y) % 2 == 0) 0 else 255)
    checkAgainstImageIO(encode(img, 0.95f), "checkerboard 40x40")
  }

  test("progressive JPEG decodes and matches ImageIO") {
    for ((w, h) <- Seq((32, 32), (67, 41), (128, 96));
         q <- Seq(0.5f, 0.9f)) {
      val img = rgb(w, h) { (x, y) =>
        val r = (x * 255 / math.max(1, w - 1))
        val g = (y * 255 / math.max(1, h - 1))
        val bl = if (((x / 8) + (y / 8)) % 2 == 0) 40 else 215
        (r << 16) | (g << 8) | bl
      }
      checkAgainstImageIO(encode(img, q, progressive = true),
        s"progressive rgb $w x $h q=$q")
    }
  }

  test("progressive grayscale JPEG decodes and matches ImageIO") {
    val img = gray(45, 29)((x, y) => (x * 9 + y * 13) % 256)
    checkAgainstImageIO(encode(img, 0.8f, progressive = true),
      "progressive gray 45x29")
  }

  test("progressive high-frequency image: coefficient-exact vs the " +
      "baseline encoding of the same source (EOB-run and refine paths)") {
    // Same image, same quality → the encoder emits IDENTICAL final
    // coefficients in both organizations; if the progressive scan
    // reassembly (spectral selection + successive approximation +
    // EOB runs) is correct, the two decodes must agree EXACTLY —
    // a stronger check than comparing against ImageIO's integer IDCT,
    // whose ±1 rounding flips dHash bits on this near-tie stripe
    // pattern (verified: my two decodes differ from ImageIO only by
    // such tie-flips while agreeing with each other bit-for-bit).
    val img = gray(48, 48)((x, y) =>
      if ((x / 2 + y / 3) % 2 == 0) 20 else 235)
    val base = Multimodal.decodeJpeg(mediaFile(encode(img, 0.93f))).get
    val prog = Multimodal.decodeJpeg(
      mediaFile(encode(img, 0.93f, progressive = true))).get
    assert(base.width == 48 && prog.width == 48)
    assert(prog.mean_luma == base.mean_luma,
      s"luma ${prog.mean_luma} vs baseline ${base.mean_luma}")
    assert(prog.dhash == base.dhash,
      "progressive reassembly must reproduce the baseline coefficients")
    // and the shared luma stays within rounding of ImageIO's decode
    val (_, _, rl, _) = reference(encode(img, 0.93f, progressive = true))
    assert(math.abs(prog.mean_luma - rl) < 0.01)
  }

  test("truncated and garbage streams are rejected") {
    val img = gray(24, 24)((x, y) => x * 10)
    val b = encode(img, 0.8f)
    assert(Multimodal.decodeJpeg(mediaFile(b.take(b.length / 2))).isEmpty)
    assert(Multimodal.decodeJpeg(
      mediaFile(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3))).isEmpty)
  }

  test("extractFeatures routes JPEG through the real decoder " +
      "(fingerprint = fnv of bytes, not the stub scramble)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jpeg-feat").toFile
    val img = rgb(48, 32)((x, y) => (x * 5 << 16) | (y * 7 << 8) | 99)
    val b = encode(img, 0.9f)
    java.nio.file.Files.write(
      new java.io.File(dir, "img.jpg").toPath, b)
    val f = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).collect().head
    val direct = Multimodal.decodeJpeg(mediaFile(b)).get
    assert(f.width == 48 && f.height == 32)
    assert(f.mean_luma == direct.mean_luma && f.dhash == direct.dhash)
  }
}
