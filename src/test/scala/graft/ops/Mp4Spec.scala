package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ISO-BMFF container walk (Multimodal.decodeMp4Meta): a hand-built
  * minimal-but-well-formed MP4 (ftyp + moov with one video trak:
  * mdhd/hdlr/stbl{stsd,stts,stsz,stss}) must yield REAL geometry,
  * sample count, duration and keyframe positions; malformed blobs must
  * fall back to the stub path unchanged.
  */
class Mp4Spec extends SparkTestBase {

  private def be32(v: Int) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8) ++ t.getBytes("US-ASCII") ++ body

  private def videoTrak(w: Int, h: Int, n: Int, timescale: Int,
                        duration: Int, syncs: Seq[Int]): Array[Byte] = {
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ be16(0x55c4) ++ be16(0))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++
      new Array[Byte](12) ++ Array[Byte](0))
    val avc1 = {
      val body = new Array[Byte](6) ++ be16(1) ++ // reserved + dref idx
        new Array[Byte](16) ++                    // pre_defined/reserved
        be16(w) ++ be16(h) ++                     // width, height
        be32(0x00480000) ++ be32(0x00480000) ++   // resolutions
        be32(0) ++ be16(1) ++ new Array[Byte](32) ++ // frame count, name
        be16(24) ++ be16(0xffff)                  // depth, pre_defined
      be32(body.length + 8) ++ "avc1".getBytes ++ body
    }
    val stsd = box("stsd", be32(0) ++ be32(1) ++ avc1)
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(n) ++ be32(166))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(n))
    val stss =
      if (syncs.isEmpty) Array.emptyByteArray
      else box("stss", be32(0) ++ be32(syncs.length) ++
        syncs.toArray.flatMap(be32))
    val stbl = box("stbl", stsd ++ stts ++ stsz ++ stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    box("trak", mdia)
  }

  /** A plausible AUDIO trak: hdlr 'soun', its own mdhd timescale/
    * duration and stsz count, and an mp4a stsd entry whose bytes at
    * the video width/height offsets are garbage — exactly the shape
    * that would poison the committed video meta if later traks were
    * descended. */
  private def audioTrak: Array[Byte] = {
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(44100) ++ be32(882000) ++ be16(0x55c4) ++ be16(0))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "soun".getBytes ++
      new Array[Byte](12) ++ Array[Byte](0))
    val mp4a = {
      val body = new Array[Byte](6) ++ be16(1) ++
        new Array[Byte](8) ++ be16(2) ++ be16(16) ++ // channels, bits
        be32(0) ++ be32(44100 << 16) ++ new Array[Byte](16)
      be32(body.length + 8) ++ "mp4a".getBytes ++ body
    }
    val stsd = box("stsd", be32(0) ++ be32(1) ++ mp4a)
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(999))
    val stbl = box("stbl", stsd ++ stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    box("trak", mdia)
  }

  /** 64×48, 24 samples, timescale 1000 / duration 4000 (4 s),
    * sync samples {1, 9, 17}. */
  private def sampleMp4: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val mvhd = box("mvhd", new Array[Byte](100))
    val moov = box("moov",
      mvhd ++ videoTrak(64, 48, 24, 1000, 4000, Seq(1, 9, 17)))
    ftyp ++ moov
  }

  private def mf(b: Array[Byte], name: String = "mem://clip.mp4") =
    Multimodal.MediaFile(name, new java.sql.Timestamp(0L),
      b.length.toLong, b)

  test("container walk yields real geometry, counts, duration, syncs") {
    val meta = Multimodal.decodeMp4Meta(mf(sampleMp4)).get
    assert(meta.width == 64 && meta.height == 48)
    assert(meta.nSamples == 24)
    assert(meta.durationS == 4.0)
    assert(meta.syncSamples == Seq(1, 9, 17))
  }

  test("multi-track file: first video trak wins; a later audio trak " +
      "never overwrites the committed meta") {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val mvhd = box("mvhd", new Array[Byte](100))
    val moov = box("moov", mvhd ++
      videoTrak(64, 48, 24, 1000, 4000, Seq(1, 9, 17)) ++ audioTrak)
    val meta = Multimodal.decodeMp4Meta(mf(ftyp ++ moov)).get
    assert(meta.width == 64 && meta.height == 48)
    assert(meta.nSamples == 24, "audio stsz (999) must not leak in")
    assert(meta.durationS == 4.0, "audio mdhd must not leak in")
    assert(meta.syncSamples == Seq(1, 9, 17))
    // audio BEFORE video: the non-video trak is walked, rejected at
    // commit, and the video trak still parses
    val moov2 = box("moov", mvhd ++ audioTrak ++
      videoTrak(64, 48, 24, 1000, 4000, Seq(1, 9, 17)))
    val meta2 = Multimodal.decodeMp4Meta(mf(ftyp ++ moov2)).get
    assert(meta2 == meta)
  }

  test("size==0 (to-end-of-file) and size==1 (64-bit largesize) boxes") {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val trak = videoTrak(64, 48, 24, 1000, 4000, Seq(1, 9, 17))
    val mvhd = box("mvhd", new Array[Byte](100))
    // mdat-before-moov where moov uses size==0 (extends to EOF)
    val mdat = box("mdat", Array.fill[Byte](32)(7))
    val moovBody = mvhd ++ trak
    val moovSz0 = be32(0) ++ "moov".getBytes("US-ASCII") ++ moovBody
    val meta0 = Multimodal.decodeMp4Meta(mf(ftyp ++ mdat ++ moovSz0)).get
    assert(meta0.width == 64 && meta0.nSamples == 24)
    // largesize: size field 1, 64-bit size after the type (header 16)
    val large = be32(1) ++ "moov".getBytes("US-ASCII") ++
      be32(0) ++ be32(moovBody.length + 16) ++ moovBody
    val meta1 = Multimodal.decodeMp4Meta(mf(ftyp ++ large)).get
    assert(meta1.width == 64 && meta1.nSamples == 24)
  }

  test("empty stss ⇒ every sample is a sync sample (all-intra video)") {
    import spark.implicits._
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val mvhd = box("mvhd", new Array[Byte](100))
    val moov = box("moov", mvhd ++
      videoTrak(64, 48, 6, 1000, 1000, Seq.empty))
    val blob = ftyp ++ moov
    assert(Multimodal.decodeMp4Meta(mf(blob)).get.syncSamples.isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("mp4-intra").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "intra.mp4").toPath, blob)
    val media = Multimodal.readBinary(spark, s"$dir/*")
    val idxs = Multimodal.extractVideoKeyframes(media).toDF()
      .select(col("frame_idx")).as[Int].collect().sorted.toSeq
    assert(idxs == Seq(0, 1, 2, 3, 4, 5), "all 6 samples are keyframes")
    val strided = Multimodal.extractVideoKeyframes(media, stride = 3)
      .toDF().select(col("frame_idx")).as[Int].collect().sorted.toSeq
    assert(strided == Seq(0, 3))
  }

  test("sample layout: stsz table + stsc/stco resolve per-sample file " +
      "offsets; payloads slice out of mdat") {
    val mjpeg = graft.queries.CustomQueries.mediaFixtureSet("clip_mjpeg.mp4")
    val meta = Multimodal.decodeMp4Meta(mf(mjpeg, "mem://c.mp4")).get
    assert(meta.width == 16 && meta.height == 11 && meta.nSamples == 3)
    assert(meta.syncSamples == Seq(1, 3))
    assert(meta.sampleOffsets.length == 3 && meta.sampleSizes.length == 3)
    // every sample is a standalone JPEG: payloads start with SOI and
    // offsets+sizes tile mdat contiguously (1 sample per chunk)
    (0 until 3).foreach { i =>
      val p = Multimodal.samplePayload(mjpeg, meta, i).get
      assert((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8,
        s"sample $i must be a JPEG bitstream")
      assert(p.length.toLong == meta.sampleSizes(i))
    }
    assert(meta.sampleOffsets(1) ==
      meta.sampleOffsets(0) + meta.sampleSizes(0))
    assert(meta.sampleOffsets(2) ==
      meta.sampleOffsets(1) + meta.sampleSizes(1))
  }

  test("co64 (64-bit chunk offsets) resolves the same layout as stco") {
    val mjpeg = graft.queries.CustomQueries.mediaFixtureSet("clip_mjpeg.mp4")
    val want = Multimodal.decodeMp4Meta(mf(mjpeg, "mem://a.mp4")).get
    // rewrite the stco box as co64 in place: same offsets, 64-bit wide
    val stcoAt = mjpeg.indexOfSlice("stco".getBytes("US-ASCII")) - 4
    val n = want.sampleOffsets.length // 1 chunk per sample here
    val offs = (0 until n).map(i => ((mjpeg(stcoAt + 16 + 4 * i) & 0xffL) << 24) |
      ((mjpeg(stcoAt + 17 + 4 * i) & 0xffL) << 16) |
      ((mjpeg(stcoAt + 18 + 4 * i) & 0xffL) << 8) |
      (mjpeg(stcoAt + 19 + 4 * i) & 0xffL))
    val co64 = be32(8 + 8 + 8 * n) ++ "co64".getBytes("US-ASCII") ++
      be32(0) ++ be32(n) ++ offs.toArray.flatMap(o =>
        be32((o >> 32).toInt) ++ be32(o.toInt))
    val old = mjpeg.slice(stcoAt, stcoAt + 8 + 8 + 4 * n)
    assert(new String(old, 4, 4, "US-ASCII") == "stco")
    // splice: replace the stco box bytes with the (larger) co64 box and
    // fix every ancestor box size (+4 bytes per offset)
    val grow = 4 * n
    val rebuilt = mjpeg.take(stcoAt) ++ co64 ++
      mjpeg.drop(stcoAt + 8 + 8 + 4 * n)
    def fixSize(b: Array[Byte], boxType: String): Unit = {
      val at = b.indexOfSlice(boxType.getBytes("US-ASCII")) - 4
      val sz = ((b(at) & 0xff) << 24) | ((b(at + 1) & 0xff) << 16) |
        ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
      be32(sz + grow).copyToArray(b, at)
    }
    Seq("moov", "trak", "mdia", "minf", "stbl").foreach(fixSize(rebuilt, _))
    val got = Multimodal.decodeMp4Meta(mf(rebuilt, "mem://b.mp4")).get
    assert(got.sampleOffsets == want.sampleOffsets)
    assert(got.sampleSizes == want.sampleSizes)
  }

  test("MJPEG keyframes decode REAL pixel content through the " +
      "container layout + JPEG decoder") {
    import spark.implicits._
    val mjpeg = graft.queries.CustomQueries.mediaFixtureSet("clip_mjpeg.mp4")
    val jpg = graft.queries.CustomQueries.mediaFixtureSet("photo.jpg")
    val want = Multimodal.decodeJpeg(mf(jpg, "mem://photo.jpg")).get
    val dir = java.nio.file.Files.createTempDirectory("mp4-mjpeg").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "c.mp4").toPath, mjpeg)
    val rows = Multimodal.extractVideoKeyframes(
        Multimodal.readBinary(spark, s"$dir/*"), stride = 1).toDF()
      .select(col("frame_idx"), col("mean_luma"), col("dhash"))
      .as[(Int, Double, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0, 2), "sync samples {1,3}")
    rows.foreach { case (_, luma, dh) =>
      assert(luma == want.mean_luma, "decoded luma must equal photo.jpg's")
      assert(dh == want.dhash, "decoded dhash must equal photo.jpg's")
    }
    // file-level view agrees: first sync sample's decode is the
    // file-level luma/dhash
    val f = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).collect().head
    assert(f.n_frames == 3 && f.mean_luma == want.mean_luma &&
      f.dhash == want.dhash)
  }

  test("malformed blobs parse to None (stub fallback preserved)") {
    assert(Multimodal.decodeMp4Meta(mf(Array[Byte](1, 2, 3))).isEmpty)
    // truncated mid-moov
    assert(Multimodal.decodeMp4Meta(
      mf(sampleMp4.take(sampleMp4.length / 2))).isEmpty)
    // audio-only track: hdlr 'soun' → no video trak
    val soun = sampleMp4
    val idx = soun.indexOfSlice("vide".getBytes("US-ASCII"))
    val audio = soun.clone()
    "soun".getBytes("US-ASCII").copyToArray(audio, idx)
    assert(Multimodal.decodeMp4Meta(mf(audio)).isEmpty)
  }

  test("extractFeatures: MP4 gets real geometry + frame count, " +
      "stub pixel content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mp4-feat").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "clip.mp4").toPath, sampleMp4)
    val f = Multimodal.extractFeatures(
      Multimodal.readBinary(spark, s"$dir/*")).collect().head
    assert(f.width == 64 && f.height == 48 && f.n_frames == 24)
    // content features are the documented fingerprint-derived stub
    val h = {
      var x = 0xcbf29ce484222325L
      sampleMp4.foreach { by => x ^= (by & 0xffL); x *= 0x100000001b3L }
      x
    }
    assert(f.fingerprint == h)
    assert(f.mean_luma == ((h >>> 33) % 256).toDouble / 255.0)
  }

  test("extractVideoKeyframes: indices from the real stss table; " +
      "stride subsamples the sync list") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mp4-kf").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "clip.mp4").toPath, sampleMp4)
    val media = Multimodal.readBinary(spark, s"$dir/*")
    val all = Multimodal.extractVideoKeyframes(media).toDF()
      .select(col("frame_idx"), col("width"), col("height"))
      .as[(Int, Int, Int)].collect().sortBy(_._1)
    assert(all.map(_._1).toSeq == Seq(0, 8, 16),
      "stss samples are 1-based; frame indices 0-based")
    assert(all.forall(t => t._2 == 64 && t._3 == 48))
    val strided = Multimodal.extractVideoKeyframes(media, stride = 2)
      .toDF().select(col("frame_idx")).as[Int].collect().sorted.toSeq
    assert(strided == Seq(0, 16))
  }
}
