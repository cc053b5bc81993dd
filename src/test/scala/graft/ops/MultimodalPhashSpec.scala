package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** dHash perceptual fingerprint: grid geometry, cross-format identity,
  * orientation handling, and the banded near-dup join.
  */
class MultimodalPhashSpec extends SparkTestBase {
  import spark.implicits._

  private val w = 18
  private val h = 16
  private def pgm(px: (Int, Int) => Int): Array[Byte] =
    s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(w * h)(i => px(i % w, i / w).toByte)
  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def grayBmp(px: (Int, Int) => Int, topDown: Boolean)
      : Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val raster = Array.tabulate(h * rowSize) { i =>
      val row = i / rowSize
      val o = i % rowSize
      val y = if (topDown) row else h - 1 - row
      if (o >= w * 3) 0.toByte else px(o / 3, y).toByte
    }
    "BM".getBytes("US-ASCII") ++
      le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(raster.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ raster
  }

  private def featuresOf(files: Map[String, Array[Byte]]) = {
    val dir = java.nio.file.Files.createTempDirectory("phash")
    files.foreach { case (n, b) =>
      java.nio.file.Files.write(dir.resolve(n), b)
    }
    Multimodal.extractFeatures(Multimodal.readBinary(spark, s"$dir/*"))
      .toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("dhash"))
      .as[(String, Long)].collect().toMap
  }

  test("dhash analytics: gradients hit the closed-form hashes") {
    val hs = featuresOf(Map(
      "grad.pgm" -> pgm((x, _) => x * 14),
      "gradv.pgm" -> pgm((_, y) => y * 15),
      "stripes.pgm" -> pgm((x, _) => if ((x / 2) % 2 == 0) 30 else 220)))
    // strictly brighter to the right → every bit set
    assert(hs("grad.pgm") == -1L)
    // constant within each row → every comparison ties → zero
    assert(hs("gradv.pgm") == 0L)
    // alternating columns → bits set at even positions: half the bits
    assert(java.lang.Long.bitCount(hs("stripes.pgm")) == 32)
  }

  test("dhash is cross-format and orientation-correct") {
    val grad = (x: Int, _: Int) => x * 14
    // y-ASYMMETRIC image: top half bright-gradient, bottom half dark —
    // a bottom-up/top-down mixup would permute grid rows and change
    // the hash
    val asym = (x: Int, y: Int) => if (y < h / 2) x * 14 else 0
    val hs = featuresOf(Map(
      "g.pgm" -> pgm(grad),
      "g_up.bmp" -> grayBmp(grad, topDown = false),
      "a.pgm" -> pgm(asym),
      "a_up.bmp" -> grayBmp(asym, topDown = false),
      "a_down.bmp" -> grayBmp(asym, topDown = true)))
    assert(hs("g.pgm") == hs("g_up.bmp"))
    assert(hs("a.pgm") == hs("a_up.bmp"),
      "bottom-up BMP must flip rows back to logical order")
    assert(hs("a.pgm") == hs("a_down.bmp"),
      "top-down BMP (negative height) reads rows as-is")
    assert(hs("a.pgm") != hs("g.pgm"))
  }

  test("imageNearDupPairs: banded LSH finds exactly the close pairs") {
    val feats = Seq(
      ("a", -1L),                   // all ones
      ("b", -1L ^ (1L << 7)),       // hamming 1 from a
      ("c", -1L ^ 0x8001000100L),   // hamming 3 from a
      ("d", 0x5555555555555555L),   // hamming 32 from a
      ("e", 0L))
      .toDF("file", "dhash")
    val pairs = Multimodal.imageNearDupPairs(feats, "file", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
      .as[(String, String, Long)].collect().toSeq
    // (b,c) sits at hamming 4 — past the budget, must be filtered even
    // though b and c both pair with a
    assert(pairs == Seq(("a", "b", 1L), ("a", "c", 3L)), s"got $pairs")
  }
}
