package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RIFF/AVI container walk (Multimodal.decodeAviMeta) + MJPEG frame
  * decode — the little-endian sibling of Mp4Spec, driven by the shared
  * clip_mjpeg.avi fixture (whose odd-length second frame exercises
  * RIFF word alignment for real).
  */
class AviSpec extends SparkTestBase {

  private def fixture = graft.queries.CustomQueries
    .mediaFixtureSet("clip_mjpeg.avi")

  private def mf(b: Array[Byte], name: String = "mem://clip.avi") =
    Multimodal.MediaFile(name, new java.sql.Timestamp(0L),
      b.length.toLong, b)

  test("container walk yields real geometry, frame offsets and timing") {
    val meta = Multimodal.decodeAviMeta(mf(fixture)).get
    assert(meta.width == 16 && meta.height == 11)
    assert(meta.nFrames == 2)
    assert(meta.durationS == 2 * 40000 / 1e6, "25 fps x 2 frames")
    // every movi chunk is a standalone JPEG bitstream
    (0 until 2).foreach { i =>
      val off = meta.frameOffsets(i).toInt
      assert((fixture(off) & 0xff) == 0xff &&
        (fixture(off + 1) & 0xff) == 0xd8, s"frame $i must start at SOI")
    }
    // frame 1 follows frame 0's chunk + its pad byte (odd-length JPEG)
    val jpg = graft.queries.CustomQueries.mediaFixtureSet("photo.jpg")
    assert(meta.frameSizes(0) == jpg.length)
  }

  test("malformed blobs parse to None; truncation past the header " +
      "degrades to zero frames, not garbage") {
    assert(Multimodal.decodeAviMeta(mf(Array[Byte](1, 2, 3))).isEmpty)
    // cut INSIDE hdrl: header unreadable → None
    assert(Multimodal.decodeAviMeta(mf(fixture.take(40))).isEmpty)
    // cut after the header but inside movi: geometry parses, the
    // truncated frame list stops cleanly at zero complete frames
    val headerOnly = Multimodal.decodeAviMeta(
      mf(fixture.take(fixture.length / 4))).get
    assert(headerOnly.width == 16 && headerOnly.nFrames == 0)
    // a WAV is RIFF but not AVI
    val wav = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII")
    assert(Multimodal.decodeAviMeta(mf(wav)).isEmpty)
  }

  test("MJPEG frames decode REAL pixel content; both frames equal " +
      "photo.jpg's decode (same image, two encodings)") {
    import spark.implicits._
    val jpg = graft.queries.CustomQueries.mediaFixtureSet("photo.jpg")
    val want = Multimodal.decodeJpeg(mf(jpg, "mem://photo.jpg")).get
    val dir = java.nio.file.Files.createTempDirectory("avi-mjpeg").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "c.avi").toPath, fixture)
    val rows = Multimodal.extractVideoKeyframes(
        Multimodal.readBinary(spark, s"$dir/*"), stride = 1).toDF()
      .select(col("frame_idx"), col("mean_luma"), col("dhash"))
      .as[(Int, Double, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0, 1), "every MJPEG frame is a keyframe")
    rows.foreach { case (_, luma, dh) =>
      assert(luma == want.mean_luma && dh == want.dhash)
    }
    val f = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).collect().head
    assert(f.width == 16 && f.height == 11 && f.n_frames == 2)
    assert(f.mean_luma == want.mean_luma && f.dhash == want.dhash)
  }
}
