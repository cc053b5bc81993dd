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
}
