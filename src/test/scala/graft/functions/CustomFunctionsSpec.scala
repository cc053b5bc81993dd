package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.Dedup

class CustomFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("NativeCosineRule rewrites HOF cosine to the fused expression") {
    val before = spark.experimental.extraOptimizations
    try {
      // non-literal source: a literal LocalRelation constant-folds away
      // before any optimizer rule could see the pattern
      def vecs = spark.range(20).select($"id",
        transform(sequence(lit(1), lit(8)),
          i => (i * ($"id" + 1)).cast("float")).as("a"),
        transform(sequence(lit(1), lit(8)),
          i => (i + $"id" * 2).cast("float")).as("b"))
      val plain = vecs.select($"id",
          VectorFunctions.cosine($"a", $"b").as("cos"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations = Seq(NativeCosineRule)
      val optimized = vecs.select($"id",
        VectorFunctions.cosine($"a", $"b").as("cos"))
      assert(optimized.queryExecution.optimizedPlan.toString
        .contains("cosine_sim"), "rule must fire on the HOF pattern")
      // bit-identical values (same per-element accumulation order)
      optimized.collect().foreach { r =>
        assert(r.getDouble(1) == plain(r.getLong(0)))
      }
      // double arrays must NOT rewrite (expression contract is float)
      val dbl = spark.range(3).select(
          transform(sequence(lit(1), lit(4)),
            i => (i * ($"id" + 1)).cast("double")).as("a"),
          transform(sequence(lit(1), lit(4)),
            i => (i + $"id").cast("double")).as("b"))
        .select(VectorFunctions.cosine($"a", $"b").as("cos"))
      assert(!dbl.queryExecution.optimizedPlan.toString
        .contains("cosine_sim"))
      assert(dbl.count() == 3)
    } finally spark.experimental.extraOptimizations = before
  }

  test("cosine_sim expression is bit-identical to the HOF formulation") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(1)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val a = vecs.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = vecs.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val both = a.join(b, $"ia" < $"ib")
      .select(
        expr("cosine_sim(va, vb)").as("native"),
        VectorFunctions.cosine($"va", $"vb").as("hof"))
    val mismatch = both.filter($"native" =!= $"hof").count()
    assert(mismatch == 0)
  }

  test("cosine_sim survives codegen and interpreted paths identically") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").select(expr("cosine_sim(a, b)").as("c"))
    val v = df.as[Double].head()
    val expected = (4.0 + 10.0 + 18.0) /
      (math.sqrt(1 + 4 + 9) * math.sqrt(16 + 25 + 36))
    assert(math.abs(v - expected) < 1e-15)
  }

  test("hyperplane_sig matches the HOF sign-fold bit-for-bit") {
    import graft.ops.Similarity
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val (nBits, t) = (8, 2)
    // reference: the interpreted HOF formulation over the SAME
    // driver-derived sign family (slice + zip_with + sequential fold)
    val hof = (0 until nBits).map { j =>
      val signs = Array.tabulate(Similarity.HyperplaneMaxDim)(
        Similarity.hyperplaneSign(t, j, _))
      val proj = aggregate(
        zip_with($"v", slice(lit(signs), lit(1), size($"v")), (v, s) =>
          v.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L)).otherwise(lit(0L))
    }.foldLeft(lit(0L))((acc, b) => acc * 2 + b)
    val rows = vecs.select($"id",
      expr(s"hyperplane_sig(v, $t, $nBits)").as("native"),
      hof.as("ref")).collect()
    assert(rows.length == 200)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
    // codegen and interpreted paths agree (fallback safety)
    val saved = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = vecs.select(expr(s"hyperplane_sig(v, $t, $nBits)"))
        .as[Long].collect()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = vecs.select(expr(s"hyperplane_sig(v, $t, $nBits)"))
        .as[Long].collect()
      assert(interp.toSeq == gen.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", saved)
  }

  test("SimHashAgg matches the pure-DataFrame simhash bit-for-bit") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "spark native analytics engine for large scale etl"),
      (2L, "a b c d e f g")).toDF("doc_id", "text")
    val viaAgg = docs
      .select($"doc_id", explode(split($"text", "\\s+")).as("tok"))
      .groupBy($"doc_id").agg(SimHashAgg.asUdaf($"tok").as("simhash"))
      .as[(Long, Long)].collect().toMap
    val viaDf = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaAgg == viaDf)
  }

  test("fnv1a64: reference vectors and null passthrough") {
    // FNV-1a 64 published test vectors (offset 0xcbf29ce484222325,
    // prime 0x100000001b3): '' → offset basis, 'a' → 0xaf63dc4c8601ec8c
    val out = Seq("", "a", "foobar").toDF("s")
      .select(Udfs.fnv1a64($"s").as("h")).as[Long].collect()
    assert(out(0) == 0xcbf29ce484222325L)
    assert(out(1) == 0xaf63dc4c8601ec8cL)
    assert(out(2) == 0x85944171f73967e8L)
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(Udfs.fnv1a64($"s").as("h"))
      .collect()
    assert(nulls(0).isNullAt(0))
  }

  test("charEntropy: hand-computed values") {
    val e = Seq("aaaa", "abab", "abcd").toDF("s")
      .select(Udfs.charEntropy($"s").as("e")).as[Double].collect()
    assert(math.abs(e(0) - 0.0) < 1e-12)
    assert(math.abs(e(1) - 1.0) < 1e-12)
    assert(math.abs(e(2) - 2.0) < 1e-12)
  }

  test("multimodal: stubbed decode is deterministic and plumbing is real") {
    import graft.ops.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("mm").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.bin").toPath,
      Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(new java.io.File(dir, "b.bin").toPath,
      Array[Byte](9, 9))
    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.bin")).toDF()
    assert(feats.count() == 2)
    val r = feats.filter($"length" === 4).head()
    assert(r.getAs[Int]("width") >= 320 && r.getAs[Int]("height") >= 240)
    // determinism across runs
    val again = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.bin")).toDF()
      .select("fingerprint").as[Long].collect().sorted
    val first = feats.select("fingerprint").as[Long].collect().sorted
    assert(again.toSeq == first.toSeq)
    val sampled = Multimodal.sampleFrames(feats, 10)
      .select(size($"sampled_frames")).as[Int].collect()
    assert(sampled.forall(_ >= 1))
  }

  test("multimodal: REAL PPM/PGM decode — exact dims and mean luma") {
    import graft.ops.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("pnm").toFile
    // P6 2x2 maxval 255: red, green, blue, white
    val p6 = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
        0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    java.nio.file.Files.write(new java.io.File(dir, "img.ppm").toPath, p6)
    // P5 1x2 maxval 255: black, white
    val p5 = "P5\n1 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 255.toByte)
    java.nio.file.Files.write(new java.io.File(dir, "img.pgm").toPath, p5)
    // garbage → stub fallback
    java.nio.file.Files.write(new java.io.File(dir, "img.jpg").toPath,
      Array[Byte](1, 2, 3))

    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).toDF()
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"width", $"height", $"mean_luma")
      .as[(String, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(feats("img.ppm")._1 == 2 && feats("img.ppm")._2 == 2)
    // mean luma of {red, green, blue, white} under Rec.601:
    // (0.299 + 0.587 + 0.114 + 1.0) / 4 = 0.5
    assert(math.abs(feats("img.ppm")._3 - 0.5) < 1e-12)
    assert(feats("img.pgm")._1 == 1 && feats("img.pgm")._2 == 2)
    assert(math.abs(feats("img.pgm")._3 - 0.5) < 1e-12)
    // the stub's synthesized dims, not a parse of the 3 garbage bytes
    assert(feats("img.jpg")._1 >= 320)
  }

  test("multimodal: REAL BMP decode — 24-bit padded rows, exact mean luma") {
    import graft.ops.Multimodal
    // hand-built 2x2 24-bit BI_RGB BMP: rows are 2*3=6 bytes padded to 8;
    // bottom-up row order. Pixels (BGR): bottom row = blue, white;
    // top row = red, green.
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val raster = Array[Byte](
      255.toByte, 0, 0,  255.toByte, 255.toByte, 255.toByte, 0, 0, // bottom
      0, 0, 255.toByte,  0, 255.toByte, 0,                   0, 0) // top
    val bmp = "BM".getBytes("US-ASCII") ++
      le32(54 + raster.length) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ raster
    val dir = java.nio.file.Files.createTempDirectory("bmp").toFile
    java.nio.file.Files.write(new java.io.File(dir, "img.bmp").toPath, bmp)

    val f = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.bmp")).toDF()
      .select($"width", $"height", $"mean_luma")
      .as[(Int, Int, Double)].collect().head
    assert(f._1 == 2 && f._2 == 2)
    // {blue, white, red, green} under Rec.601 → (0.114+1+0.299+0.587)/4
    assert(math.abs(f._3 - 0.5) < 1e-12)
    // truncated/garbage BMP header → stub, not a crash
    java.nio.file.Files.write(new java.io.File(dir, "bad.bmp").toPath,
      "BMxx".getBytes("US-ASCII"))
    val n = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.bmp")).toDF().count()
    assert(n == 2)
  }

  test("multimodal: REAL PCM WAV decode — header, duration, RMS, peak") {
    import graft.ops.Multimodal
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // 16-bit mono 8 kHz: 2000 frames of a 440 Hz sine at amplitude 0.5,
    // with a LIST chunk before data (exercises the chunk walk)
    val nFrames = 2000
    val samples = Array.tabulate(nFrames) { i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toInt
    }
    val pcm = samples.flatMap(le16)
    val listChunk = "LIST".getBytes("US-ASCII") ++ le32(4) ++
      "INFO".getBytes("US-ASCII")
    val fmtChunk = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16)
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm
    val body = "WAVE".getBytes("US-ASCII") ++ fmtChunk ++ listChunk ++
      dataChunk
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val dir = java.nio.file.Files.createTempDirectory("wav").toFile
    java.nio.file.Files.write(new java.io.File(dir, "tone.wav").toPath, wav)
    // mp3-shaped garbage → stub fallback, not a crash
    java.nio.file.Files.write(new java.io.File(dir, "x.mp3").toPath,
      Array[Byte](-1, -5, 100, 0, 1, 2))

    val feats = Multimodal.extractAudioFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).toDF()
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"sample_rate", $"channels", $"n_frames", $"duration_s",
        $"rms", $"peak")
      .as[(String, Int, Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    val t = feats("tone.wav")
    assert(t._2 == 8000 && t._3 == 1 && t._4 == nFrames)
    assert(math.abs(t._5 - 0.25) < 1e-12)          // 2000/8000 s
    assert(math.abs(t._6 - 0.5 / math.sqrt(2)) < 0.002) // sine RMS=A/√2
    assert(t._7 <= 0.5 && t._7 > 0.49)
    assert(feats.contains("x.mp3")) // stub row present
    // determinism of the real decode across a second scan
    val again = Multimodal.extractAudioFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).toDF()
      .select($"rms").as[Double].collect().sorted
    assert(again.toSeq ==
      feats.values.map(_._6).toSeq.sorted)
  }

  test("multimodal: 8-bit stereo WAV normalizes around the 128 offset") {
    import graft.ops.Multimodal
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // 2 frames stereo: L/R = (255, 0), (128, 192) → normalized
    // (127/128, -1, 0, 0.5)
    val pcm = Array[Byte](255.toByte, 0, 128.toByte, 192.toByte)
    val wavBody = "WAVE".getBytes("US-ASCII") ++
      ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
        le32(4000) ++ le32(8000) ++ le16(2) ++ le16(8)) ++
      ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(wavBody.length) ++ wavBody
    val dir = java.nio.file.Files.createTempDirectory("wav8").toFile
    java.nio.file.Files.write(new java.io.File(dir, "s.wav").toPath, wav)
    val f = Multimodal.extractAudioFeatures(
      Multimodal.readBinary(spark, s"$dir/*.wav")).toDF()
      .select($"sample_rate", $"channels", $"n_frames", $"rms", $"peak")
      .as[(Int, Int, Long, Double, Double)].collect().head
    assert(f._1 == 4000 && f._2 == 2 && f._3 == 2)
    val xs = Seq(127.0 / 128, -1.0, 0.0, 0.5)
    assert(math.abs(f._4 - math.sqrt(xs.map(x => x * x).sum / 4)) < 1e-12)
    assert(math.abs(f._5 - 1.0) < 1e-12)
  }

  // ---- PNG test-side encoder (independent arithmetic direction: the
  // tests FILTER known pixels, Multimodal.decodePng must UNfilter them
  // back; a sign/order bug in either direction breaks the roundtrip) ----
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    be32(data.length.toLong) ++ tb ++ data ++ be32(crc.getValue)
  }

  /** Minimal PNG encoder: 8-bit depth, chosen filter type per row,
    * IDAT split into two chunks (decoders must concatenate).
    */
  private def encodePng(w: Int, h: Int, colorType: Int,
                        pixels: Array[Int], filters: Seq[Int]): Array[Byte] = {
    val channels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = filters(y % filters.length)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x)
        val left = if (x >= channels) pixels(y * stride + x - channels) else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) else 0
        val ul = if (x >= channels && y > 0)
          pixels((y - 1) * stride + x - channels) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val pr = left + up - ul
            val pa = (pr - left).abs; val pb = (pr - up).abs
            val pc = (pr - ul).abs
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (stride + 1) + 1 + x) = (cur - pred).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = out.toByteArray
    val ihdr = Array[Byte]((w >> 24).toByte, (w >> 16).toByte,
      (w >> 8).toByte, w.toByte, (h >> 24).toByte, (h >> 16).toByte,
      (h >> 8).toByte, h.toByte, 8, colorType.toByte, 0, 0, 0)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val (z1, z2) = z.splitAt(math.max(1, z.length / 2))
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", z1) ++
      pngChunk("IDAT", z2) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  test("multimodal: REAL PNG decode — all 5 filter types, exact mean luma") {
    import graft.ops.Multimodal
    // 3x5 RGB, deterministic pixel pattern; rows use filters 0..4
    val (w, h) = (3, 5)
    val px = Array.tabulate(w * h * 3)(i => (i * 37 + 11) % 256)
    val png = encodePng(w, h, colorType = 2, px, filters = Seq(0, 1, 2, 3, 4))
    val dir = java.nio.file.Files.createTempDirectory("png").toFile
    java.nio.file.Files.write(new java.io.File(dir, "img.png").toPath, png)
    // gray+alpha (type 4): luma = gray channel, alpha ignored
    val pxGa = Array.tabulate(2 * 2 * 2)(i => (i * 91 + 5) % 256)
    java.nio.file.Files.write(new java.io.File(dir, "ga.png").toPath,
      encodePng(2, 2, colorType = 4, pxGa, filters = Seq(4, 1)))
    // truncated IDAT → stub fallback, not a crash
    java.nio.file.Files.write(new java.io.File(dir, "bad.png").toPath,
      png.take(60))

    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.png")).toDF()
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"width", $"height", $"mean_luma")
      .as[(String, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(feats("img.png")._1 == 3 && feats("img.png")._2 == 5)
    val want = (0 until w * h).map(p => 0.299 * px(p * 3) +
      0.587 * px(p * 3 + 1) + 0.114 * px(p * 3 + 2)).sum / (w * h) / 255.0
    assert(math.abs(feats("img.png")._3 - want) < 1e-12)
    assert(feats("ga.png")._1 == 2 && feats("ga.png")._2 == 2)
    val wantGa = (0 until 4).map(p => pxGa(p * 2).toDouble)
      .sum / 4 / 255.0
    assert(math.abs(feats("ga.png")._3 - wantGa) < 1e-12)
    // truncated file hit the stub (synthesized dims), not the parser
    assert(feats("bad.png")._1 >= 320)
  }

  test("multimodal: PNG decode agrees with the JDK's independent encoder") {
    import graft.ops.Multimodal
    // ImageIO's PNG writer (pure-JDK, present headless) picks its own
    // filters/compression — if our unfilter logic is wrong anywhere,
    // the luma of a non-trivial image won't match
    val (w, h) = (17, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 53 + y * 17) % 256 << 16) |
        ((x * 29 + y * 97) % 256 << 8) | ((x * 71 + y * 13) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val dir = java.nio.file.Files.createTempDirectory("png-io").toFile
    java.nio.file.Files.write(new java.io.File(dir, "io.png").toPath,
      bos.toByteArray)
    // gray variant (color type 0) — write RASTER samples directly:
    // setRGB on TYPE_BYTE_GRAY routes through a nonlinear sRGB→gray
    // colorspace conversion and would not store `g` itself
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (x * 41 + y * 23) % 256)
    val bg = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "png", bg))
    java.nio.file.Files.write(new java.io.File(dir, "gray.png").toPath,
      bg.toByteArray)

    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.png")).toDF()
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"width", $"height", $"mean_luma")
      .as[(String, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    def lumaOf(b: java.awt.image.BufferedImage): Double =
      (for (y <- 0 until h; x <- 0 until w) yield {
        val rgb = b.getRGB(x, y)
        0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }).sum / (w * h) / 255.0
    assert(feats("io.png")._1 == w && feats("io.png")._2 == h)
    assert(math.abs(feats("io.png")._3 - lumaOf(img)) < 1e-9)
    assert(feats("gray.png")._1 == w)
    val grayWant = (for (y <- 0 until h; x <- 0 until w)
      yield gray.getRaster.getSample(x, y, 0).toDouble)
      .sum / (w * h) / 255.0
    assert(math.abs(feats("gray.png")._3 - grayWant) < 1e-9)
  }

  test("multimodal: Adam7-interlaced PNG decodes identically to the " +
      "sequential encoding of the same image") {
    import graft.ops.Multimodal
    // ImageIO's progressive PNG mode writes Adam7 — the independent
    // encode direction for the 7-pass unfilter+scatter path. 17×11 is
    // deliberately not a multiple of 8: every pass has ragged
    // dimensions, and passes narrower than their step exercise the
    // empty/short-pass arithmetic.
    val (w, h) = (17, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 53 + y * 17) % 256 << 16) |
        ((x * 29 + y * 97) % 256 << 8) | ((x * 71 + y * 13) % 256))
    def write(progressive: Boolean): Array[Byte] = {
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(
        if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
        else javax.imageio.ImageWriteParam.MODE_DISABLED)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      bos.toByteArray
    }
    val seq7 = write(progressive = false)
    val adam = write(progressive = true)
    assert((seq7(28) & 0xff) == 0 && (adam(28) & 0xff) == 1,
      "fixture must actually be (non-)interlaced")
    val dir = java.nio.file.Files.createTempDirectory("png-a7").toFile
    java.nio.file.Files.write(new java.io.File(dir, "seq.png").toPath,
      seq7)
    java.nio.file.Files.write(new java.io.File(dir, "adam.png").toPath,
      adam)
    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.png")).toDF()
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"width", $"height", $"mean_luma", $"dhash")
      .as[(String, Int, Int, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(feats("adam.png")._1 == w && feats("adam.png")._2 == h)
    // same pixels → bit-identical luma AND dhash across interlacings
    assert(feats("adam.png") == feats("seq.png"))
  }

  test("multimodal: GIF LZW decode agrees with the JDK's independent encoder") {
    import graft.ops.Multimodal
    // ImageIO's GIF writer produces a real variable-width LZW stream —
    // if our dictionary growth / code-size bumps / KwKwK handling is
    // wrong anywhere, the luma of a non-trivial image won't match
    val pal = Array.tabulate(64)(i =>
      ((i * 4) << 16) | ((255 - i * 4) << 8) | (i * 2 + 31))
    val icm = new java.awt.image.IndexColorModel(8, 64,
      pal.map(c => ((c >> 16) & 0xff).toByte),
      pal.map(c => ((c >> 8) & 0xff).toByte),
      pal.map(c => (c & 0xff).toByte))
    val (w, h) = (23, 13)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 11) % 64)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val dir = java.nio.file.Files.createTempDirectory("gif-io").toFile
    java.nio.file.Files.write(new java.io.File(dir, "io.gif").toPath,
      bos.toByteArray)
    // 2-frame animated GIF via the ImageWriter sequence API
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos2 = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos2)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    Seq(0, 1).foreach { f =>
      val fr = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        fr.getRaster.setSample(x, y, 0, (x * 3 + y * 5 + f * 17) % 64)
      wr.writeToSequence(new javax.imageio.IIOImage(fr, null, null), null)
    }
    wr.endWriteSequence(); ios.close()
    java.nio.file.Files.write(new java.io.File(dir, "anim.gif").toPath,
      bos2.toByteArray)

    val feats = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.gif")).toDF()
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"width", $"height", $"n_frames", $"mean_luma")
      .as[(String, Int, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val want = (for (y <- 0 until h; x <- 0 until w) yield {
      val c = pal((x * 7 + y * 11) % 64)
      0.299 * ((c >> 16) & 0xff) + 0.587 * ((c >> 8) & 0xff) +
        0.114 * (c & 0xff)
    }).sum / (w * h) / 255.0
    assert(feats("io.gif")._1 == w && feats("io.gif")._2 == h)
    assert(feats("io.gif")._3 == 1)
    assert(math.abs(feats("io.gif")._4 - want) < 1e-9)
    // animated: both descriptors counted; first-frame luma
    assert(feats("anim.gif")._3 == 2)
    val want0 = (for (y <- 0 until h; x <- 0 until w) yield {
      val c = pal((x * 3 + y * 5) % 64)
      0.299 * ((c >> 16) & 0xff) + 0.587 * ((c >> 8) & 0xff) +
        0.114 * (c & 0xff)
    }).sum / (w * h) / 255.0
    assert(math.abs(feats("anim.gif")._4 - want0) < 1e-9)
  }

  test("multimodal: IMA ADPCM decode — block plumbing + published tables") {
    import graft.ops.Multimodal
    // pinned single-step vectors at both table ends (catch any
    // step/index-table transcription error)
    assert(Multimodal.imaStep(0, 0, 2) == ((3, 0)))       // step 7
    assert(Multimodal.imaStep(0, 88, 7) == ((32767, 88))) // step 32767
    assert(Multimodal.imaStep(0, 0, 10) == ((-3, 0)))     // sign bit
    // encode a sine by per-nibble argmin search over the recurrence,
    // exactly 2 full blocks (505 samples each) — no padding ambiguity
    val rate = 8000
    val blockAlign = 256
    val spb = 1 + (blockAlign - 4) * 2
    val n = 2 * spb
    val pcm = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 440 * i / rate) * 12000).toInt)
    val data = new java.io.ByteArrayOutputStream()
    var index = 0
    var i = 0
    while (i < n) {
      val seed = pcm(i)
      data.write(seed & 0xff); data.write((seed >> 8) & 0xff)
      data.write(index); data.write(0)
      var pred = seed
      i += 1
      var low = -1
      var cnt = 0
      while (cnt < (blockAlign - 4) * 2) {
        val target = pcm(i)
        val best = (0 until 16).minBy(nb =>
          math.abs(Multimodal.imaStep(pred, index, nb)._1 - target))
        val (np, ni) = Multimodal.imaStep(pred, index, best)
        pred = np; index = ni; i += 1
        if (low < 0) low = best
        else { data.write(low | (best << 4)); low = -1 }
        cnt += 1
      }
    }
    val payload = data.toByteArray
    // RIFF/WAVE wrapper: fmt (tag 0x11, mono) + data
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes); w32(4 + 24 + 8 + payload.length)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16)
    w16(0x11); w16(1); w32(rate); w32(rate * blockAlign / spb)
    w16(blockAlign); w16(4)
    bos.write("data".getBytes); w32(payload.length); bos.write(payload)
    val dir = java.nio.file.Files.createTempDirectory("adpcm").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.wav").toPath,
      bos.toByteArray)

    val f = Multimodal.extractAudioFeatures(
      Multimodal.readBinary(spark, s"$dir/*.wav")).toDF()
      .select($"sample_rate", $"n_frames", $"rms", $"peak")
      .as[(Int, Long, Double, Double)].collect().head
    assert(f._1 == rate && f._2 == n.toLong)
    // scalar replay of the decode over the same bytes must match the
    // operator bit-for-bit
    var (sumSq, peak2) = (0.0, 0.0)
    var bp = 0
    while (bp < payload.length) {
      var pred = ((payload(bp) & 0xff) | ((payload(bp + 1) & 0xff) << 8))
      if (pred >= 0x8000) pred -= 0x10000
      var idx = payload(bp + 2) & 0xff
      def s(v: Int): Unit = {
        val x = v / 32768.0; sumSq += x * x
        peak2 = math.max(peak2, math.abs(x))
      }
      s(pred)
      for (q <- bp + 4 until bp + blockAlign) {
        val by = payload(q) & 0xff
        val a = Multimodal.imaStep(pred, idx, by & 0xf)
        pred = a._1; idx = a._2; s(pred)
        val c = Multimodal.imaStep(pred, idx, by >> 4)
        pred = c._1; idx = c._2; s(pred)
      }
      bp += blockAlign
    }
    assert(f._3 == math.sqrt(sumSq / n))
    assert(f._4 == peak2)
    // and the codec actually tracked the signal (bitstream plumbing —
    // wrong nibble order / block walk would wreck this)
    val origRms = math.sqrt(pcm.map(v => {
      val x = v / 32768.0; x * x }).sum / n)
    assert(math.abs(f._3 - origRms) / origRms < 0.05)
  }

  test("multimodal: palette (PLTE) PNG decode agrees with ImageIO") {
    import graft.ops.Multimodal
    // 64-entry palette forces the JDK writer to 8-bit indices (color
    // type 3, depth 8 — sub-byte palette depths stay stub territory)
    val pal = Array.tabulate(64)(i =>
      ((i * 4) << 16) | ((255 - i * 4) << 8) | (i * 2 + 31))
    val icm = new java.awt.image.IndexColorModel(8, 64,
      pal.map(c => ((c >> 16) & 0xff).toByte),
      pal.map(c => ((c >> 8) & 0xff).toByte),
      pal.map(c => (c & 0xff).toByte))
    val (w, h) = (9, 7)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 13 + y * 5) % 64)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val dir = java.nio.file.Files.createTempDirectory("png-pal").toFile
    java.nio.file.Files.write(new java.io.File(dir, "pal.png").toPath,
      bos.toByteArray)
    val f = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*.png")).toDF()
      .select($"width", $"height", $"mean_luma")
      .as[(Int, Int, Double)].collect().head
    assert(f._1 == w && f._2 == h)
    val want = (for (y <- 0 until h; x <- 0 until w) yield {
      val c = pal((x * 13 + y * 5) % 64)
      0.299 * ((c >> 16) & 0xff) + 0.587 * ((c >> 8) & 0xff) +
        0.114 * (c & 0xff)
    }).sum / (w * h) / 255.0
    assert(math.abs(f._3 - want) < 1e-9)
  }

  test("multimodal resize plan: aspect-preserving fit, no-op when small") {
    import graft.ops.Multimodal
    val feats = Seq((1600, 900), (320, 240), (512, 512), (100, 2000))
      .toDF("width", "height")
    val out = Multimodal.resizePlan(feats, maxDim = 512)
      .select($"width", $"height", $"out_width", $"out_height", $"resized")
      .as[(Int, Int, Int, Int, Boolean)].collect().toSet
    assert(out == Set(
      (1600, 900, 512, 288, true),   // landscape: long side pinned to 512
      (320, 240, 320, 240, false),   // already fits: untouched
      (512, 512, 512, 512, false),   // boundary: untouched
      (100, 2000, 25, 512, true)))   // portrait: aspect preserved
    // aspect ratio preserved within integer floor on every resized row
    out.filter(_._5).foreach { case (w, h, ow, oh, _) =>
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) <
        math.max(1.0 / oh, 1.0 / ow) * 2)
    }
  }

  test("lcs_pack: hand-built cases including the min-start tie-break") {
    GraftFunctions.register(spark)
    def lcs(a: String, b: String): (Long, Long) = {
      val pk = Seq((a, b)).toDF("a", "b")
        .select(expr("lcs_pack(a, b)")).as[Long].collect().head
      (pk / LcsUtil.Pack, pk % LcsUtil.Pack)
    }
    assert(lcs("zabcy", "xxabcde") == (3L, 2L))   // "abc" at a-pos 2
    assert(lcs("abc", "xyz") == (0L, 0L))          // disjoint
    assert(lcs("", "abc") == (0L, 0L))             // empty side
    assert(lcs("same", "same") == (4L, 1L))        // identical
    assert(lcs("aaaa", "aa") == (2L, 1L))          // repeats: first window
    // two maximal matches ("ab" at 1 and at 4): minimum start wins
    assert(lcs("abZab", "ab") == (2L, 1L))
    // later-but-longer beats earlier-but-shorter
    assert(lcs("ab123cdef", "ab@cdef") == (4L, 6L)) // "cdef" over "ab"
  }

  test("lcs_pack matches a substring-set reference on random strings") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def rndStr(): String =
      Seq.fill(rnd.nextInt(26))("abc".charAt(rnd.nextInt(3))).mkString
    val cases = (0 until 200).map(_ => (rndStr(), rndStr()))
    // independent reference: longest L with a shared L-substring, and
    // the smallest start of one in `a`
    def ref(a: String, b: String): (Long, Long) = {
      for (len <- math.min(a.length, b.length) to 1 by -1) {
        val inB = (0 to b.length - len).map(j => b.substring(j, j + len)).toSet
        (0 to a.length - len).foreach { i =>
          if (inB(a.substring(i, i + len))) return (len.toLong, i + 1L)
        }
      }
      (0L, 0L)
    }
    val got = cases.toDF("a", "b")
      .select($"a", $"b", expr("lcs_pack(a, b)").as("pk"))
      .as[(String, String, Long)].collect()
    got.foreach { case (a, b, pk) =>
      assert((pk / LcsUtil.Pack, pk % LcsUtil.Pack) == ref(a, b),
        s"a=$a b=$b")
    }
  }

  test("lcs_pack: null inputs yield null; oversized input is rejected") {
    GraftFunctions.register(spark)
    val out = Seq(("x", Option("x")), ("x", None))
      .toDF("a", "b")
      .select(expr("lcs_pack(a, b)").as("pk"))
      .collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
    val big = "a" * ((1 << 21) + 1)
    val ex = intercept[Exception] {
      Seq((big, "a")).toDF("a", "b")
        .select(expr("lcs_pack(a, b)")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[IllegalArgumentException]))
  }
}
