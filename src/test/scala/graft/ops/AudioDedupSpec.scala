package graft.ops

import graft.SparkTestBase

/** Audio energy-delta hash (Multimodal.audioEnergyHash) — the
  * time-domain dHash: envelope SHAPE in, scale out. Near-dup pairs via
  * the shared pigeonhole-banded LSH join.
  */
class AudioDedupSpec extends SparkTestBase {

  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** 16-bit mono 8 kHz sine, 65 windows x 32 frames, per-window amp. */
  private def wav(amp: Int => Double, nWin: Int = 65): Array[Byte] = {
    val pcm = Array.tabulate(nWin * 32) { i =>
      (amp(i / 32) * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767)
        .toInt
    }.flatMap(le16)
    val body = "WAVE".getBytes("US-ASCII") ++
      ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)) ++
      ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def mf(b: Array[Byte], name: String = "mem://a.wav") =
    Multimodal.MediaFile(name, new java.sql.Timestamp(0L),
      b.length.toLong, b)

  private def env(w: Int): Double = 0.1 + 0.8 * (((w * 37 + 11) % 64) / 63.0)

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("gain change leaves the hash IDENTICAL (shape, not scale)") {
    val h1 = Multimodal.audioEnergyHash(mf(wav(env))).get
    val h2 = Multimodal.audioEnergyHash(mf(wav(w => env(w) * 0.5))).get
    assert(h1 == h2)
  }

  test("one-window dropout flips only the adjacent comparisons; a " +
      "different envelope diverges") {
    val h = Multimodal.audioEnergyHash(mf(wav(env))).get
    val drop = Multimodal.audioEnergyHash(
      mf(wav(w => if (w == 20) env(w) * 0.05 else env(w)))).get
    assert(hamming(h, drop) <= 2 && hamming(h, drop) >= 1,
      s"dropout must cost at most the two adjacent bits, got ${hamming(h, drop)}")
    val other = Multimodal.audioEnergyHash(
      mf(wav(w => 0.1 + 0.8 * (((w * 53 + 29) % 64) / 63.0)))).get
    assert(hamming(h, other) > 10,
      s"different material must diverge, got ${hamming(h, other)}")
  }

  test("non-PCM and too-short clips yield no hash") {
    assert(Multimodal.audioEnergyHash(
      mf(Array[Byte](-1, -5, 100, 0), "mem://x.mp3")).isEmpty)
    // 64 windows' worth of frames < the 65 required
    val short = wav(env, nWin = 1)
    assert(Multimodal.audioEnergyHash(mf(short)).isEmpty)
  }

  test("audioNearDupPairs: banded LSH finds the dropout pair only; " +
      "shuffle rows are (id, hash, slice), never samples") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audiodedup").toFile
    Seq(
      "a.wav" -> wav(env),
      "b.wav" -> wav(w => if (w == 20) env(w) * 0.05 else env(w)),
      "c.wav" -> wav(w => 0.1 + 0.8 * (((w * 53 + 29) % 64) / 63.0))
    ).foreach { case (n, b) =>
      java.nio.file.Files.write(new java.io.File(dir, n).toPath, b)
    }
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.readBinary(spark, s"$dir/*"), maxHamming = 3)
      .select(
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("id_a"), "/"), -1),
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("id_b"), "/"), -1),
        org.apache.spark.sql.functions.col("hamming"))
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(pairs.map(p => (p._1, p._2)) == Seq(("a.wav", "b.wav")))
    assert(pairs.head._3 <= 3)
  }
}
