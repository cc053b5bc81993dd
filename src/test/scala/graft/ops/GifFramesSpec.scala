package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Multi-frame GIF decode (Multimodal.decodeGifFrames / extractGifFrames):
  * agreement with the single-frame decoder on frame 0, per-frame
  * independence against an INDEPENDENT encoder (the JDK's ImageIO GIF
  * writer — a real compressing LZW stream, unlike the fixture encoder's
  * literal codes), stride sampling, and non-GIF rejection.
  */
class GifFramesSpec extends SparkTestBase {
  import spark.implicits._

  private val pal = Array.tabulate(64)(i =>
    ((i * 4) << 16) | ((255 - i * 4) << 8) | (i * 2 + 31))
  private def icm = new java.awt.image.IndexColorModel(8, 64,
    pal.map(c => ((c >> 16) & 0xff).toByte),
    pal.map(c => ((c >> 8) & 0xff).toByte),
    pal.map(c => (c & 0xff).toByte))
  private val (w, h) = (23, 13)

  private def animGif(nFrames: Int): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val fr = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        fr.getRaster.setSample(x, y, 0, (x * 3 + y * 5 + f * 17) % 64)
      wr.writeToSequence(new javax.imageio.IIOImage(fr, null, null), null)
    }
    wr.endWriteSequence(); ios.close()
    bos.toByteArray
  }

  private def lumaOf(f: Int): Double =
    (for (y <- 0 until h; x <- 0 until w) yield {
      val c = pal((x * 3 + y * 5 + f * 17) % 64)
      0.299 * ((c >> 16) & 0xff) + 0.587 * ((c >> 8) & 0xff) +
        0.114 * (c & 0xff)
    }).sum / (w * h) / 255.0

  private def mediaFile(b: Array[Byte]): Multimodal.MediaFile =
    Multimodal.MediaFile("mem://anim.gif",
      new java.sql.Timestamp(0L), b.length.toLong, b)

  test("every frame decodes with its own analytic luma") {
    val frames = Multimodal.decodeGifFrames(mediaFile(animGif(3)))
    assert(frames.map(_.frame_idx) == Seq(0, 1, 2))
    frames.foreach { fr =>
      assert(fr.width == w && fr.height == h)
      assert(math.abs(fr.mean_luma - lumaOf(fr.frame_idx)) < 1e-9,
        s"frame ${fr.frame_idx}")
    }
    // distinct rasters ⇒ the per-frame hashes are not all equal
    assert(frames.map(_.dhash).distinct.size > 1)
  }

  test("frame 0 agrees with the single-frame decoder (luma and dhash)") {
    val m = mediaFile(animGif(2))
    val whole = Multimodal.decodeGif(m).get
    val f0 = Multimodal.decodeGifFrames(m).head
    assert(f0.mean_luma == whole.mean_luma)
    assert(f0.dhash == whole.dhash)
    assert(whole.n_frames == 2)
  }

  test("stride keeps every stride-th frame with original indices") {
    val m = mediaFile(animGif(5))
    assert(Multimodal.decodeGifFrames(m, stride = 2)
      .map(_.frame_idx) == Seq(0, 2, 4))
    assert(Multimodal.decodeGifFrames(m, stride = 5)
      .map(_.frame_idx) == Seq(0))
  }

  test("extractGifFrames: distributed path, non-GIF files yield no rows") {
    val dir = java.nio.file.Files.createTempDirectory("gif-frames").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "anim.gif").toPath, animGif(4))
    java.nio.file.Files.write(
      new java.io.File(dir, "noise.bin").toPath, Array[Byte](1, 2, 3))
    val got = Multimodal.extractGifFrames(
        Multimodal.readBinary(spark, s"$dir/*"), stride = 3).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("f"),
        col("frame_idx"))
      .as[(String, Int)].collect().toSet
    assert(got == Set(("anim.gif", 0), ("anim.gif", 3)))
  }

  test("extractVideoKeyframes: stub frame table agrees with the " +
      "file-level stub; GIFs pass through real decode; stills excluded") {
    val dir = java.nio.file.Files.createTempDirectory("vid-frames").toFile
    val clip = Array[Byte](9, 9, 9, 1)
    java.nio.file.Files.write(
      new java.io.File(dir, "clip.mp4").toPath, clip)
    java.nio.file.Files.write(
      new java.io.File(dir, "anim.gif").toPath, animGif(3))
    java.nio.file.Files.write(
      new java.io.File(dir, "still.pgm").toPath,
      "P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
    val media = Multimodal.readBinary(spark, s"$dir/*")
    val stride = 50
    val frames = Multimodal.extractVideoKeyframes(media, stride).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("f"),
        col("frame_idx"), col("width"), col("height"),
        col("mean_luma"), col("dhash"))
      .as[(String, Int, Int, Int, Double, Long)].collect()
    // frame-level view must agree with the file-level stub decode:
    // count = ceil(n_frames/stride), geometry identical per frame
    val fileView = Multimodal.extractFeatures(
        media.filter(col("path").endsWith(".mp4"))).collect().head
    val vid = frames.filter(_._1 == "clip.mp4").sortBy(_._2)
    assert(vid.length == (fileView.n_frames + stride - 1) / stride)
    assert(vid.map(_._2).toSeq ==
      (0 until fileView.n_frames by stride).toSeq)
    vid.foreach { case (_, _, w0, h0, luma, _) =>
      assert(w0 == fileView.width && h0 == fileView.height)
      assert(luma >= 0.0 && luma <= 1.0)
    }
    // sampled frames are distinct deterministic rows (hash varies by idx)
    assert(vid.map(_._6).distinct.length == vid.length)
    assert(Multimodal.extractVideoKeyframes(media, stride).toDF()
      .as[(String, Int, Int, Int, Double, Long)].collect().toSet
      .map((t: (String, Int, Int, Int, Double, Long)) => t._6) ==
      frames.map(_._6).toSet)
    // GIF rows come from the REAL frame decoder (stride applies there too)
    val gif = frames.filter(_._1 == "anim.gif")
    assert(gif.map(_._2).toSeq == Seq(0))
    assert(gif.head._3 == w && gif.head._4 == h)
    // stills yield nothing in the keyframe table
    assert(!frames.exists(_._1 == "still.pgm"))
  }

  test("sceneCuts: consecutive-frame hamming over the threshold cuts; " +
      "identical and near-identical frames don't; files are " +
      "independent window partitions") {
    import spark.implicits._
    val frames = Seq(
      // file a: identical, 1-bit, far, far
      ("a", 0, 0x0L), ("a", 1, 0x0L), ("a", 2, 0x1L),
      ("a", 3, 0xffffffffL), ("a", 4, -1L),
      // file b: constant — no cuts ever
      ("b", 0, 7L), ("b", 1, 7L), ("b", 2, 7L)
    ).toDF("path", "frame_idx", "dhash")
    val cuts = Multimodal.sceneCuts(frames, threshold = 16)
      .select(col("path"), col("from_idx").cast("int"),
        col("cut_idx").cast("int"), col("dist"))
      .as[(String, Int, Int, Long)].collect().sortBy(c => (c._1, c._3))
      .toSeq
    assert(cuts == Seq(("a", 2, 3, 31L), ("a", 3, 4, 32L)),
      s"got $cuts") // 0x1^0xffffffff = 31 bits; 0xffffffff^-1 = 32 bits
  }
}
