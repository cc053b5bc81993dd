package graft.ops

import graft.SparkTestBase
import graft.ops.Multimodal.{ExifMeta, MediaFile}

/** TIFF/EXIF IFD walker (Multimodal.parseTiffBlock / exifOf) against
  * the independently-assembled fixture bytes, plus malformed-input
  * robustness (truncation, wild offsets) — the parser must degrade to
  * has_exif = false, never throw.
  */
class ExifSpec extends SparkTestBase {

  private def mf(name: String, bytes: Array[Byte]) =
    MediaFile(name, new java.sql.Timestamp(0L), bytes.length.toLong,
      bytes)

  private val fx = graft.queries.CustomQueries.exifFixtureSet

  test("little-endian APP1 with Exif + GPS sub-IFDs") {
    val got = Multimodal.exifOf(mf("a.jpg", fx("exif_le.jpg")))
    assert(got == ExifMeta("a.jpg", "jpeg", has_exif = true,
      Some("II"), Some(6L), Some("GraftCam"), Some("GC-1"),
      Some("2026:01:02 03:04:05"), Some(16L), Some(11L),
      Some(37774999L), Some(-122418332L)))
  }

  test("big-endian APP1; southern/western refs negate") {
    val got = Multimodal.exifOf(mf("b.jpg", fx("exif_be.jpg")))
    assert(got.byte_order.contains("MM") &&
      got.orientation.contains(3L) && got.make.contains("MM-Cam") &&
      got.pixel_x.contains(640L) && got.pixel_y.contains(480L) &&
      got.gps_lat_micro.isEmpty)
  }

  test("standalone TIFF file walks IFD0 directly") {
    val got = Multimodal.exifOf(mf("m.tif", fx("meta.tif")))
    assert(got.fmt == "tiff" && got.has_exif &&
      got.pixel_x.contains(800L) && got.pixel_y.contains(600L) &&
      got.make.contains("TiffCam") && got.orientation.contains(1L))
  }

  test("JPEG without APP1 and non-media bytes degrade cleanly") {
    val plain = Multimodal.exifOf(mf("p.jpg", fx("noexif.jpg")))
    assert(plain.fmt == "jpeg" && !plain.has_exif)
    val txt = Multimodal.exifOf(mf("n.txt", fx("note.txt")))
    assert(txt.fmt == "other" && !txt.has_exif)
  }

  test("malformed inputs never throw: truncation and wild IFD offset") {
    val full = fx("exif_le.jpg")
    for (cut <- Seq(3, 6, 12, 21, 40, 64)) {
      val got = Multimodal.exifOf(mf("t.jpg", full.take(cut)))
      assert(!got.has_exif, s"truncated at $cut must not parse")
    }
    // TIFF header whose IFD0 offset points past EOF
    val wild = Array[Byte]('I', 'I', 42, 0) ++
      Array[Byte](0x40, 0x42, 0x0f, 0x00) // offset 999488
    val got = Multimodal.exifOf(mf("w.tif", wild))
    assert(got.fmt == "tiff" && !got.has_exif)
  }
}
