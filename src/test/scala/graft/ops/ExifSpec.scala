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

  test("decodeTiff: identical raster gives identical luma+dhash as " +
    "BMP and PNM decoders (cross-format contract)") {
    val tfx = graft.queries.CustomQueries.tiffRasterFixtureSet
    val mfx = graft.queries.CustomQueries.mediaFixtureSet
    val tiffRgb = Multimodal.decodeTiff(mf("r.tif", tfx("img_rgb.tif")))
      .get
    val bmp = Multimodal.decodeBmp(mf("i.bmp", mfx("img.bmp"))).get
    assert(tiffRgb.width == bmp.width && tiffRgb.height == bmp.height)
    assert(tiffRgb.mean_luma == bmp.mean_luma)
    assert(tiffRgb.dhash == bmp.dhash)
    val tiffGray = Multimodal.decodeTiff(
      mf("g.tif", tfx("img_gray.tif"))).get
    val pgm = Multimodal.decodePnm(mf("i.pgm", mfx("img.pgm"))).get
    assert(tiffGray.mean_luma == pgm.mean_luma)
    assert(tiffGray.dhash == pgm.dhash)
  }

  test("decodeTiff declines metadata-only, compressed-tag and " +
    "truncated-strip files") {
    val tfx = graft.queries.CustomQueries.tiffRasterFixtureSet
    assert(Multimodal.decodeTiff(mf("m.tif", tfx("meta.tif"))).isEmpty)
    val rgb = tfx("img_rgb.tif")
    // strip data cut off → decoder must decline, not crash
    assert(Multimodal.decodeTiff(
      mf("t.tif", rgb.dropRight(7))).isEmpty)
    // flip the Compression tag value (type SHORT, value at entry+8)
    val lzw = rgb.clone()
    // find the 0x0103 entry: entries start at 10 (header 8 + count 2)
    var p = 10
    var patched = false
    while (!patched && p + 12 <= lzw.length) {
      val tag = (lzw(p) & 0xff) | ((lzw(p + 1) & 0xff) << 8)
      if (tag == 0x0103) { lzw(p + 8) = 5; patched = true }
      p += 12
    }
    assert(patched)
    assert(Multimodal.decodeTiff(mf("l.tif", lzw)).isEmpty)
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
