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

  /** 64×48, 24 samples, timescale 1000 / duration 4000 (4 s),
    * sync samples {1, 9, 17}. */
  private def sampleMp4: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(4000) ++ be16(0x55c4) ++ be16(0))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes ++
      new Array[Byte](12) ++ Array[Byte](0))
    val avc1 = {
      val body = new Array[Byte](6) ++ be16(1) ++ // reserved + dref idx
        new Array[Byte](16) ++                    // pre_defined/reserved
        be16(64) ++ be16(48) ++                   // width, height
        be32(0x00480000) ++ be32(0x00480000) ++   // resolutions
        be32(0) ++ be16(1) ++ new Array[Byte](32) ++ // frame count, name
        be16(24) ++ be16(0xffff)                  // depth, pre_defined
      be32(body.length + 8) ++ "avc1".getBytes ++ body
    }
    val stsd = box("stsd", be32(0) ++ be32(1) ++ avc1)
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(24) ++ be32(166))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(24))
    val stss = box("stss", be32(0) ++ be32(3) ++
      be32(1) ++ be32(9) ++ be32(17))
    val stbl = box("stbl", stsd ++ stts ++ stsz ++ stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", mdia)
    val mvhd = box("mvhd", new Array[Byte](100))
    val moov = box("moov", mvhd ++ trak)
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
