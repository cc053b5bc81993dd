package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** vadWindows: exact integer energies, partial-window drop, and the
  * non-decodable-payload exclusions. */
class VadSpec extends SparkTestBase {
  import spark.implicits._

  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  private def wav(samples: Seq[Int], channels: Int = 1,
                  bits: Int = 16): Array[Byte] = {
    val pcm =
      if (bits == 16) samples.toArray.flatMap(le16)
      else samples.toArray.map(s => (s + 128).toByte)
    val frame = channels * bits / 8
    val body = "WAVE".getBytes("US-ASCII") ++
      ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
        le16(channels) ++ le32(8000) ++ le32(8000 * frame) ++
        le16(frame) ++ le16(bits)) ++
      ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def media(name: String, bytes: Array[Byte]) =
    Multimodal.MediaFile(name, new Timestamp(0L), bytes.length.toLong,
      bytes)

  private val t0 = new Timestamp(0L)

  test("window energies are the exact integer sum of squares") {
    // 4 samples/window: [3,4,0,0] → 25, [1,1,1,1] → 4, trailing [7]
    // dropped
    val m = media("a.wav", wav(Seq(3, 4, 0, 0, 1, 1, 1, 1, 7)))
    val out = Multimodal.vadWindows(Seq(m).toDS(), 4)
      .collect().map(w => (w.widx, w.energy)).sorted.toSeq
    assert(out == Seq((0L, 25L), (1L, 4L)))
  }

  test("negative samples square positively; full-scale stays in Long") {
    val m = media("b.wav", wav(Seq(-32768, 32767, -1, 0)))
    val out = Multimodal.vadWindows(Seq(m).toDS(), 4).collect()
    assert(out.head.energy ==
      32768L * 32768L + 32767L * 32767L + 1L)
  }

  test("stereo, 8-bit, and non-WAV payloads emit no windows") {
    val st = media("st.wav", wav(Seq(1, 2, 3, 4), channels = 2))
    val b8 = media("b8.wav", wav(Seq(1, 2, 3, 4), bits = 8))
    val mp3 = media("x.mp3", Array[Byte](-1, -5, 100, 0))
    assert(Multimodal.vadWindows(Seq(st, b8, mp3).toDS(), 2).count() == 0)
  }

  test("file shorter than one window emits nothing") {
    val m = media("tiny.wav", wav(Seq(5, 5)))
    assert(Multimodal.vadWindows(Seq(m).toDS(), 4).count() == 0)
  }

  test("grayPatches: exact sums, ceil-grid edge tiles, P5-only") {
    // 5×3 image, patch 2 → 3×2 grid; pixel value = x + 10*y
    val raster = (for (y <- 0 until 3; x <- 0 until 5)
      yield (x + 10 * y).toByte).toArray
    val pgm = media("g.pgm",
      "P5\n5 3\n255\n".getBytes("US-ASCII") ++ raster)
    val p6 = media("c.ppm", // P6 color must decline
      "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3))
    val got = Multimodal.grayPatches(Seq(pgm, p6).toDS(), 2)
      .collect().map(p => ((p.py, p.px), (p.n_px, p.sum_gray))).toMap
    def ref(py: Int, px: Int) = {
      val cells = for {
        y <- (2 * py) until math.min(2 * py + 2, 3)
        x <- (2 * px) until math.min(2 * px + 2, 5)
      } yield x + 10 * y
      (cells.size.toLong, cells.map(_.toLong).sum)
    }
    assert(got.size == 6)
    for (py <- 0 until 2; px <- 0 until 3)
      assert(got((py.toLong, px.toLong)) == ref(py, px), s"($py,$px)")
  }
}
