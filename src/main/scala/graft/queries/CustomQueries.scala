package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SimHashAgg, Udfs}
import graft.io.Tables
import graft.ops.Multimodal

/** Custom-surface exemplars registered as queries: native Catalyst
  * expression, typed Aggregator (udaf), scalar UDF, multimodal plumbing.
  */
object CustomQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Cosine near-dup pairs via the codegen'd native expression, on the
    * blocked exact all-pairs join (same oracle as q_dedup_embedding, same
    * no-BNL plan shape) — the exemplar that a custom Catalyst Expression
    * composes with any join strategy.
    */
  def qCustomCosineExpr(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    graft.ops.Dedup.embeddingExactPairs(Tables.embeddings(spark, dir),
        "vec_id", "embedding", minCosine = 0.45, blocks = 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash per document via the typed Aggregator (partial-agg form);
    * same portable md5-derived hash family as Dedup.simhash, so it shares
    * the same DuckDB oracle (modulo column names).
    */
  def qCustomSimhashAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(SimHashAgg.asUdaf(col("tok")).as("simhash"))
      .orderBy(col("doc_id"))

  /** Character-entropy quality signal via scalar UDF, oracle-checked
    * against a pure-SQL entropy (char frequencies → −Σ p·log₂p). Both
    * engines round to 6 decimals: the sum's accumulation order differs
    * across engines but the drift is ~1e-13, far below the rounding
    * threshold. (The fnv1a64 UDF twin is spec-only — FNV needs wrapping
    * 64-bit multiply, which DuckDB SQL can't express.)
    */
  def qCustomUdfEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        round(Udfs.charEntropy(col("text")), 6).as("entropy"))
      .orderBy(col("doc_id"))

  /** Multimodal feature pipeline (decode → frame-sample → resize plan)
    * over the deterministic media fixture set. Every output — geometry,
    * FNV fingerprint, resize plan, sampled-frame count — is a pure
    * function of the fixed fixture bytes, so the oracle is a pinned
    * VALUES table (same discipline as q_multimodal_decode). The
    * binaryFile → mapPartitions plumbing is the exact path a 100 TB
    * media lake runs; only the input set is pinned.
    */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-feat")
    mediaFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.resizePlan(
        Multimodal.sampleFrames(
          Multimodal.extractFeatures(media).toDF(), stride = 30),
        maxDim = 512)
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("fingerprint"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("out_width").cast("long").as("out_width"),
        col("out_height").cast("long").as("out_height"),
        col("n_frames").cast("long").as("n_frames"),
        size(col("sampled_frames")).cast("long").as("n_sampled"))
      .orderBy(col("file"))
  }

  /** Multimodal audio feature path over deterministic WAV fixtures:
    * REAL 16-bit PCM decode (tone.wav), REAL 8-bit stereo PCM (st.wav),
    * REAL IMA-ADPCM block decode (ima.wav), plus one codec-format blob
    * (x.mp3) through the documented stub fallback. All features are pure
    * functions of the fixed bytes → pinned VALUES oracle.
    */
  def qMultimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-audio")
    audioFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.extractAudioFeatures(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("fingerprint"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"),
        col("n_frames").cast("long").as("n_frames"),
        round(col("duration_s"), 6).as("duration_s"),
        round(col("rms"), 6).as("rms_r6"),
        round(col("peak"), 6).as("peak_r6"))
      .orderBy(col("file"))
  }

  /** Deterministic audio fixture bytes for q_multimodal_audio: a 440 Hz
    * 16-bit mono PCM tone (with a LIST chunk before data, exercising the
    * chunk walk), a 2-frame 8-bit stereo PCM file (128-offset path), a
    * 1-block IMA-ADPCM file with a fixed nibble pattern, and an
    * mp3-shaped blob that must fall through to the stub. Byte-identical
    * every run.
    */
  private lazy val audioFixtures: Map[String, Array[Byte]] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // 16-bit mono 8 kHz, 2000 frames of a 440 Hz sine at amplitude 0.5
    val pcm16 = Array.tabulate(2000) { i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toInt
    }.flatMap(le16)
    val tone = {
      val body = "WAVE".getBytes("US-ASCII") ++
        ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)) ++
        ("LIST".getBytes("US-ASCII") ++ le32(4) ++
          "INFO".getBytes("US-ASCII")) ++
        ("data".getBytes("US-ASCII") ++ le32(pcm16.length) ++ pcm16)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // 8-bit stereo, 2 frames: (255,0),(128,192) → peak 1.0 after the
    // 128-offset normalization
    val st = {
      val pcm = Array[Byte](255.toByte, 0, 128.toByte, 192.toByte)
      val body = "WAVE".getBytes("US-ASCII") ++
        ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
          le32(4000) ++ le32(8000) ++ le16(2) ++ le16(8)) ++
        ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // IMA-ADPCM mono 8 kHz, exactly one 256-byte block (505 frames):
    // seed 1000, index 0, nibble byte pattern (7i+3) mod 256
    val ima = {
      val blockAlign = 256
      val payload = Array[Byte](
        (1000 & 0xff).toByte, ((1000 >> 8) & 0xff).toByte, 0, 0) ++
        Array.tabulate(blockAlign - 4)(i => ((7 * i + 3) % 256).toByte)
      val spb = 1 + (blockAlign - 4) * 2 // 505 samples per block
      val body = "WAVE".getBytes("US-ASCII") ++
        ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(0x11) ++
          le16(1) ++ le32(8000) ++ le32(8000 * blockAlign / spb) ++
          le16(blockAlign) ++ le16(4)) ++
        ("data".getBytes("US-ASCII") ++ le32(payload.length) ++ payload)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val mp3 = Array[Byte](-1, -5, 100, 0, 1, 2)
    Map("tone.wav" -> tone, "st.wav" -> st, "ima.wav" -> ima,
      "x.mp3" -> mp3)
  }

  /** VAD fixture window script — the single source of truth for BOTH
    * engines: each char is one 200-sample window ('s' silence, 'v'
    * voice = period-8 square ±8000, 'h' hum = period-8 square ±100,
    * 25 period repeats per window). speech.wav carries two voice
    * bursts; quiet.wav never crosses the threshold. */
  private[queries] val vadPattern: Seq[Char] =
    ("sss" + "vvvvv" + "ss" + "vvv" + "s" + "hhhh").toSeq
  private[queries] val vadQuietPattern: Seq[Char] = "hhhhhhhhhh".toSeq
  private[queries] val vadVoicePeriod: Seq[Int] =
    Seq(8000, 8000, 8000, 8000, -8000, -8000, -8000, -8000)
  private[queries] val vadHumPeriod: Seq[Int] =
    Seq(100, 100, 100, 100, -100, -100, -100, -100)

  /** 16-bit mono 8 kHz WAVs tiling the VAD window script, plus a codec
    * blob that must emit no windows. Byte-identical every run. */
  private lazy val vadFixtures: Map[String, Array[Byte]] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(samples: Seq[Int]): Array[Byte] = {
      val pcm = samples.toArray.flatMap(le16)
      val body = "WAVE".getBytes("US-ASCII") ++
        ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)) ++
        ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    def windows(pat: Seq[Char]): Seq[Int] = pat.flatMap {
      case 'v' => Seq.fill(25)(vadVoicePeriod).flatten
      case 'h' => Seq.fill(25)(vadHumPeriod).flatten
      case _   => Seq.fill(200)(0)
    }
    Map("speech.wav" -> wav(windows(vadPattern)),
      "quiet.wav" -> wav(windows(vadQuietPattern)),
      "x.mp3" -> Array[Byte](-1, -5, 100, 0, 1, 2))
  }

  /** ENERGY-THRESHOLD VOICE-ACTIVITY SEGMENTATION (Rabiner & Sambur
    * 1975's energy gate — the pre-ASR chunking step of every speech
    * data pipeline): [[graft.ops.Multimodal.vadWindows]] folds each
    * 16-bit PCM file into exact per-window Σs² energies inside
    * mapPartitions (the codec exception class), and EVERYTHING after
    * the decode is relational — threshold filter, gaps-and-islands on
    * (file, widx), one aggregate per segment. speech.wav yields its two
    * planted voice bursts (windows 3–7 and 10–12); the hum windows,
    * quiet.wav, and the mp3 blob must all be absent — the oracle, which
    * regenerates every window energy from the shared vadPattern script
    * and replays the segmentation, certifies the exclusions by row
    * count. Scale: decode is one pass per file; segmentation shuffles
    * ~40 window rows per second of audio on (file) — a pipeline that
    * VAD-chunks a 100 TB audio corpus moves KBs of metadata per hour of
    * input, never the PCM.
    */
  def qMultimodalVad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scratch = java.nio.file.Files.createTempDirectory("mm-vad")
    vadFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val win = Multimodal.vadWindows(
      Multimodal.readBinary(spark, s"$scratch/*"), 200).toDF()
    win.filter(col("energy") >= 1000000000L)
      .withColumn("grp", col("widx") - row_number().over(
        Window.partitionBy(col("path")).orderBy(col("widx"))))
      .groupBy(col("path"), col("grp"))
      .agg(min(col("widx")).as("seg_start"),
        max(col("widx")).as("seg_end"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("energy_sum"))
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("seg_start"), col("seg_end"), col("n_windows"),
        col("energy_sum"))
      .orderBy(col("file"), col("seg_start"))
  }

  /** Integer sample-period tables for the Goertzel fixtures — literal
    * in BOTH engines (the twin regenerates the tiled sample stream from
    * these, so the oracle replays the DSP without reading WAV bytes). */
  private[queries] val tonePeriod6: Seq[Int] =
    Seq(0, 13856, 13856, 0, -13856, -13856) // fundamental at fs/6
  private[queries] val tonePeriod4: Seq[Int] =
    Seq(0, 15000, 0, -15000)                // fundamental at fs/4

  /** 16-bit mono 8 kHz WAV from integer samples — pure integer PCM,
    * byte-identical every run (shared by the Goertzel fixtures). */
  private def monoWav8k(samples: Seq[Int]): Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val pcm = samples.toArray.flatMap(le16)
    val body = "WAVE".getBytes("US-ASCII") ++
      ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)) ++
      ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** WAVs tiling the integer period tables. */
  private lazy val goertzelFixtures: Map[String, Array[Byte]] =
    Map("tone6.wav" -> monoWav8k(Seq.fill(400)(tonePeriod6).flatten),
      "tone4.wav" -> monoWav8k(Seq.fill(600)(tonePeriod4).flatten))

  /** GOERTZEL tone probes over the real PCM decode path
    * ([[graft.ops.Multimodal.goertzelProbes]]): two pure-integer tone
    * fixtures (periods 6 and 4 at 8 kHz — fundamentals exactly at the
    * fs/6 and fs/4 probe bins), four integer-coefficient probes each.
    * Exactness bound honored: n = 2400 samples of |x| ≤ 15000 keep
    * every Goertzel state under ~2³⁶ and every power under 2⁵³, so the
    * powers are exact integers and the twin's struct-fold replay is
    * bit-identical. Expected physics: tone6's power concentrates at
    * fs_over_6, tone4's at fs_over_4 — visible in share_ppm.
    */
  def qMultimodalGoertzel(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-goertzel")
    goertzelFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.goertzelProbes(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("probe"), col("power"),
        round(col("share_ppm"), 6).as("share_ppm_r6"))
      .orderBy(col("file"), col("probe"))
  }

  /** GOERTZEL SPECTROGRAM over the real PCM decode path
    * ([[graft.ops.Multimodal.goertzelSpectrogram]]): a 2400-sample
    * sweep fixture whose tone CHANGES halfway (period-6 fundamental
    * for samples 0–1199, period-4 for 1200–2399), framed at 240
    * samples (a whole number of both periods) — the time×frequency
    * grid must show the power concentration migrating from the
    * fs_over_6 bin (frames 0–4) to fs_over_4 (frames 5–9). Same
    * integer-exactness bound as [[qMultimodalGoertzel]]: 240-sample
    * frames of |x| ≤ 15000 keep every state far under 2⁵³.
    */
  def qMultimodalSpectrogram(spark: SparkSession, dir: String)
      : DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-spect")
    java.nio.file.Files.write(scratch.resolve("sweep.wav"), monoWav8k(
      Seq.fill(200)(tonePeriod6).flatten ++
        Seq.fill(300)(tonePeriod4).flatten))
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.goertzelSpectrogram(media, 240).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("frame"), col("probe"), col("power"))
      .orderBy(col("file"), col("frame"), col("probe"))
  }

  /** Twin of [[qMultimodalSpectrogram]]: regenerates the sweep sample
    * stream from the shared period literals and replays the per-frame
    * recurrence with the [[goertzelOracleSql]] list-fold (see its
    * scaladoc for why the accumulator is a 2-list, not a struct). */
  private def spectrogramOracleSql: String = {
    def arr(xs: Seq[Int]) = xs.mkString("[", ",", "]")
    val probes = Seq(("fs_over_6", "1.0"), ("fs_over_4", "0.0"),
      ("fs_over_3", "-1.0"), ("fs_over_2", "-2.0"))
    val probeRows = probes.map { case (p, c) =>
      s"SELECT '$p' AS probe, CAST($c AS DOUBLE) AS c"
    }.mkString(" UNION ALL ")
    s"""WITH per AS (SELECT ${arr(tonePeriod6)} AS p6,
       |    ${arr(tonePeriod4)} AS p4),
       |xs AS (SELECT list_transform(generate_series(0, 2399),
       |    i -> CAST(CASE WHEN i < 1200
       |      THEN p6[CAST(i % 6 + 1 AS INT)]
       |      ELSE p4[CAST((i - 1200) % 4 + 1 AS INT)] END AS DOUBLE))
       |    AS x FROM per),
       |fr AS (SELECT unnest(generate_series(0, 9)) AS frame),
       |pr AS ($probeRows),
       |sl AS (SELECT frame, list_transform(generate_series(1, 240),
       |    j -> x[CAST(frame * 240 + j AS INT)]) AS xf
       |  FROM xs CROSS JOIN fr),
       |st AS (SELECT frame, probe, c,
       |    list_reduce(list_transform(xf,
       |      v -> [v, CAST(0.0 AS DOUBLE)]),
       |      (a, b) -> [(b[1] + c * a[1]) - a[2], a[1]]) AS s
       |  FROM sl CROSS JOIN pr)
       |SELECT 'sweep.wav' AS file, CAST(frame AS BIGINT) AS frame,
       |  probe,
       |  CAST((s[1] * s[1] + s[2] * s[2]) - c * s[1] * s[2] AS BIGINT)
       |    AS power
       |FROM st ORDER BY file, frame, probe""".stripMargin
  }

  /** Twin of [[qMultimodalGoertzel]]: regenerates the tiled integer
    * sample streams from the shared period literals and replays the
    * recurrence as a two-element LIST fold [s₁, s₂] (acc seeds from
    * the first element — [x₀, 0] — exactly the engine's state after
    * its first step). A STRUCT accumulator would be the natural shape,
    * but DuckDB 1.0's list_reduce computes struct fields in lambda
    * results incorrectly (both fields collapse to the first — verified
    * on a 3-element trace); list indexing folds correctly. */
  private def goertzelOracleSql: String = {
    def arr(xs: Seq[Int]) = xs.mkString("[", ",", "]")
    val files = Seq(("tone4.wav", tonePeriod4, 600),
      ("tone6.wav", tonePeriod6, 400))
    val fileRows = files.map { case (f, per, reps) =>
      s"SELECT '$f' AS file, ${arr(per)} AS per, " +
        s"${per.size * reps} AS n"
    }.mkString(" UNION ALL ")
    val probes = Seq(("fs_over_6", "1.0"), ("fs_over_4", "0.0"),
      ("fs_over_3", "-1.0"), ("fs_over_2", "-2.0"))
    val probeRows = probes.zipWithIndex.map { case ((p, c), i) =>
      s"SELECT '$p' AS probe, CAST($c AS DOUBLE) AS c, $i AS ord"
    }.mkString(" UNION ALL ")
    s"""WITH f AS ($fileRows),
       |xs AS (SELECT file, list_transform(generate_series(0, n - 1),
       |    i -> CAST(per[CAST(i % len(per) + 1 AS INT)] AS DOUBLE))
       |    AS x FROM f),
       |pr AS ($probeRows),
       |st AS (SELECT file, probe, ord, c,
       |    list_reduce(list_transform(x,
       |      v -> [v, CAST(0.0 AS DOUBLE)]),
       |      (a, b) -> [(b[1] + c * a[1]) - a[2], a[1]]) AS s
       |  FROM xs CROSS JOIN pr),
       |pw AS (SELECT file, probe, ord,
       |    (s[1] * s[1] + s[2] * s[2]) - c * s[1] * s[2] AS p
       |  FROM st),
       |tot AS (SELECT file, list_reduce(list_prepend(
       |    CAST(0.0 AS DOUBLE), list(p ORDER BY ord)), (a, b) -> a + b)
       |    AS t FROM pw GROUP BY file)
       |SELECT pw.file, pw.probe, CAST(pw.p AS BIGINT) AS power,
       |  round(pw.p * 1000000.0 / t, 6) AS share_ppm_r6
       |FROM pw JOIN tot USING (file)
       |ORDER BY file, probe""".stripMargin
  }

  /** Deterministic fixtures for the audio near-dup query: 16-bit mono
    * 8 kHz sines whose per-window amplitude ENVELOPE is the controlled
    * variable (65 windows × 32 frames — the energy-delta hash bit i
    * compares window i to i+1). beat_a and beat_b share the same
    * pseudo-random envelope except one attenuated window (a dropout —
    * the near-dup case, small Hamming); beat_c follows a different
    * envelope (far). All analytic; the pinned oracle carries the exact
    * pair distances.
    */
  private lazy val audioDedupFixtures: Map[String, Array[Byte]] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(amp: Int => Double): Array[Byte] = {
      val pcm = Array.tabulate(65 * 32) { i =>
        (amp(i / 32) * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767)
          .toInt
      }.flatMap(le16)
      val body = "WAVE".getBytes("US-ASCII") ++
        ("fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)) ++
        ("data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    def envA(w: Int): Double = 0.1 + 0.8 * (((w * 37 + 11) % 64) / 63.0)
    Map(
      "beat_a.wav" -> wav(envA),
      // same recording with one window attenuated to near-silence
      "beat_b.wav" -> wav(w => if (w == 20) envA(w) * 0.05 else envA(w)),
      "beat_c.wav" -> wav(w => 0.1 + 0.8 * (((w * 53 + 29) % 64) / 63.0)),
      // non-PCM blob: yields no hash row (codec formats need decoders)
      "y.mp3" -> Array[Byte](-1, -5, 100, 0, 1, 2))
  }

  /** Perceptual near-duplicate AUDIO pairs — the audio member of the
    * near-dup family (text MinHash/winnow, image dHash, audio
    * energy-delta hash): the 64-bit envelope-shape fingerprint drops
    * into the SAME pigeonhole-banded LSH join as image dHash, so the
    * dropout copy pairs with its original at small Hamming while the
    * different-envelope recording stays out. The non-PCM blob yields
    * no hash row (decoders, not fingerprints, are the codec boundary).
    */
  def qMultimodalAudioDedup(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-audiodedup")
    audioDedupFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val hashes = Multimodal.extractAudioHashes(
        Multimodal.readBinary(spark, s"$scratch/*"))
      .select(element_at(split(col("path"), "/"), -1).as("id"),
        col("dhash"))
    Multimodal.imageNearDupPairs(hashes, "id", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic media fixture bytes for q_multimodal_decode — the
    * formats the REAL decoders parse (PPM/PGM/BMP/PNG/baseline JPEG)
    * plus one codec-format blob that exercises the documented stub
    * fallback.
    * Byte-identical on every run, so the decoded features are
    * pinned-expectation oracle-checkable (the expected widths/lumas are
    * analytic properties of these bytes; the PNG is a 3×5 RGB image
    * exercising all 5 scanline filter types, generated once from the
    * same filter arithmetic CustomFunctionsSpec's encoder validates
    * against the JDK's ImageIO).
    */
  /** Fixture bytes shared with q_lake_listing_pinned (names + sizes
    * are part of that oracle's pinned expectations) and the ops-level
    * container specs (Mp4Spec drives the MJPEG fixture directly).
    */
  private[graft] def mediaFixtureSet: Map[String, Array[Byte]] =
    mediaFixtures

  private lazy val mediaFixtures: Map[String, Array[Byte]] = {
    // P6 2x2: red, green, blue, white → Rec.601 mean luma exactly 0.5
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
        0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    // P5 1x2: black, white → mean luma 0.5
    val pgm = "P5\n1 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 255.toByte)
    // 24-bit BI_RGB BMP 2x2 (rows padded to 4): blue, white / red, green
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val raster = Array[Byte](
      255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0,
      0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    val bmp = "BM".getBytes("US-ASCII") ++
      le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ raster
    // 3x5 8-bit RGB PNG, pixel i = (i*37+11) mod 256, one scanline per
    // filter type 0..4; mean luma 0.48916209... → r6 0.489162
    val png = ("89504e470d0a1a0a0000000d4948445200000003000000050802000000" +
      "0f13c1f50000002b49444154789c63e03608ad9a7fe4259f316344eda27c3060" +
      "f28501e6059b8ede8b030116202f1f24b40700cd171279a72d70e40000000049" +
      "454e44ae426082").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    // not a parseable format → deterministic stub features from fnv
    val mp4 = Array[Byte](1, 2, 3)
    // 16×11 baseline JPEG (JDK ImageIO encoder, quality 0.75, 4:2:0):
    // R/G gradients + an 8-px blue checker — DC and AC both carry
    // signal. Decoded by the REAL baseline decoder (Multimodal
    // .decodeJpeg, JpegSpec cross-validates vs ImageIO); its pinned
    // luma is the decoder's deterministic output for these bytes.
    // Named photo.* so the prefix-filter oracle (q_lake_listing_pinned,
    // prefix "img") is unaffected.
    val jpg = ("ffd8ffe000104a46494600010200000100010000ffdb0043000806060706" +
      "05080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20" +
      "242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ff" +
      "db0043010909090c0b0c180d0d1832211c21323232323232323232323232" +
      "323232323232323232323232323232323232323232323232323232323232" +
      "3232323232323232ffc0001108000b001003012200021101031101ffc400" +
      "1f0000010501010101010100000000000000000102030405060708090a0b" +
      "ffc400b5100002010303020403050504040000017d010203000411051221" +
      "31410613516107227114328191a1082342b1c11552d1f02433627282090a" +
      "161718191a25262728292a3435363738393a434445464748494a53545556" +
      "5758595a636465666768696a737475767778797a838485868788898a9293" +
      "9495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6" +
      "c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7" +
      "f8f9faffc4001f0100030101010101010101010000000000000102030405" +
      "060708090a0bffc400b51100020102040403040705040400010277000102" +
      "031104052131061241510761711322328108144291a1b1c109233352f015" +
      "6272d10a162434e125f11718191a262728292a35363738393a4344454647" +
      "48494a535455565758595a636465666768696a737475767778797a828384" +
      "85868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7" +
      "b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9ea" +
      "f2f3f4f5f6f7f8f9faffda000c03010002110311003f00e534ff00097d93" +
      "1fbbdfbbdb18c575161e12fb263f77bf77b6318aecf43b583e6fddaf6aea" +
      "744b583e6fddaf6ae3a99cd59fb2f65eef37372f5e4b7c5bfc5cde7b7438" +
      "387b882b2dcfffd9")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the SAME 16×11 image as photo.jpg, PROGRESSIVE encoding (SOF2,
    // spectral selection + successive approximation): pins the
    // multi-scan decode path end-to-end. Same quality => the encoder
    // emits identical final coefficients, so luma_r6 matches photo.jpg.
    val jpgProg = ("ffd8ffe000104a46494600010200000100010000ffdb0043000806060706" +
      "05080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20" +
      "242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ff" +
      "db0043010909090c0b0c180d0d1832211c21323232323232323232323232" +
      "323232323232323232323232323232323232323232323232323232323232" +
      "3232323232323232ffc2001108000b001003012200021101031101ffc400" +
      "14000100000000000000000000000000000005ffc4001501010100000000" +
      "000000000000000000000304ffda000c0301000210031000000125469419" +
      "ff00ffc400191000020301000000000000000000000000000201030412ff" +
      "da0008010100010502af272264e4a160a560ffc400161101010100000000" +
      "000000000000000000050002ffda0008010301013f013d0ddfffc4001d11" +
      "0001020700000000000000000000000011021200010421516171ffda0008" +
      "010201013f015562a6d6d891acf4c7ffc400151001010000000000000000" +
      "0000000000000031ffda0008010100063f028888ffc40017100003010000" +
      "000000000000000000000000112161ffda0008010100013f21d266d32b82" +
      "f83fffda000c03010002000300000010d7ffc40016110003000000000000" +
      "0000000000000000000131ffda0008010301013f10529fffc4001a110000" +
      "07000000000000000000000000000021314161a1b1ffda0008010201013f" +
      "10d7c0b2b1187fffc4001810000203000000000000000000000000000011" +
      "2181a1ffda0008010100013f1087892447c4922882a83fffd9")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // well-formed minimal ISO-BMFF container (ftyp + moov, one video
    // trak: 64x48, 24 samples, 4 s, stss sync samples {1,9,17}):
    // geometry/counts/duration/keyframes parse for REAL via the box
    // walk (Multimodal.decodeMp4Meta); only pixel content is stub.
    val mp4box = ("000000146674797069736f6d0000000069736f6d000001836d6f6f760000" +
      "006c6d766864000000000000000000000000000000000000000000000000" +
      "000000000000000000000000000000000000000000000000000000000000" +
      "000000000000000000000000000000000000000000000000000000000000" +
      "000000000000000000000000000000000000010f7472616b000001076d64" +
      "6961000000206d646864000000000000000000000000000003e800000fa0" +
      "55c400000000002168646c72000000000000000076696465000000000000" +
      "00000000000000000000be6d696e66000000b67374626c00000066737473" +
      "640000000000000001000000566176633100000000000000010000000000" +
      "000000000000000000000000400030004800000048000000000000000100" +
      "000000000000000000000000000000000000000000000000000000000000" +
      "000018ffff0000001873747473000000000000000100000018000000a600" +
      "0000147374737a0000000000000000000000180000001c73747373000000" +
      "0000000003000000010000000900000011")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // MJPEG-in-MP4: every sample is a standalone JPEG bitstream, so the
    // container layout (stsz per-sample sizes + stsc/stco chunk map)
    // and the real JPEG decoder COMPOSE into fully real video decode —
    // no inter-frame codec needed. Samples: photo.jpg, photo_prog.jpg,
    // photo.jpg (the same 16×11 image under two encodings → every
    // frame's decoded luma/dhash equals photo.jpg's); syncs {1, 3}.
    val mjpeg = {
      def bx(t: String, body: Array[Byte]): Array[Byte] =
        be32r(body.length + 8) ++ t.getBytes("US-ASCII") ++ body
      val frames = Seq(jpg, jpgProg, jpg)
      val ftyp = bx("ftyp",
        "isom".getBytes("US-ASCII") ++ be32r(0) ++
          "isom".getBytes("US-ASCII"))
      val mdat = bx("mdat", frames.toArray.flatten)
      val off0 = ftyp.length + 8
      val offsets = frames.scanLeft(off0)((o, f) => o + f.length).init
      val mdhd = bx("mdhd", be32r(0) ++ be32r(0) ++ be32r(0) ++
        be32r(1000) ++ be32r(3000) ++ be16r(0x55c4) ++ be16r(0))
      val hdlr = bx("hdlr", be32r(0) ++ be32r(0) ++
        "vide".getBytes("US-ASCII") ++ new Array[Byte](12) ++
        Array[Byte](0))
      val entry = { // 'jpeg' visual sample entry, 16×11
        val body = new Array[Byte](6) ++ be16r(1) ++
          new Array[Byte](16) ++ be16r(16) ++ be16r(11) ++
          be32r(0x00480000) ++ be32r(0x00480000) ++ be32r(0) ++
          be16r(1) ++ new Array[Byte](32) ++ be16r(24) ++ be16r(0xffff)
        be32r(body.length + 8) ++ "jpeg".getBytes("US-ASCII") ++ body
      }
      val stsd = bx("stsd", be32r(0) ++ be32r(1) ++ entry)
      val stts = bx("stts", be32r(0) ++ be32r(1) ++ be32r(3) ++
        be32r(1000))
      val stsz = bx("stsz", be32r(0) ++ be32r(0) ++ be32r(3) ++
        frames.toArray.flatMap(f => be32r(f.length)))
      val stsc = bx("stsc", be32r(0) ++ be32r(1) ++
        be32r(1) ++ be32r(1) ++ be32r(1)) // 1 sample per chunk
      val stco = bx("stco", be32r(0) ++ be32r(3) ++
        offsets.toArray.flatMap(be32r))
      val stss = bx("stss", be32r(0) ++ be32r(2) ++ be32r(1) ++ be32r(3))
      val stbl = bx("stbl", stsd ++ stts ++ stsz ++ stsc ++ stco ++ stss)
      val mdia = bx("mdia", mdhd ++ hdlr ++ bx("minf", stbl))
      val moov = bx("moov",
        bx("mvhd", new Array[Byte](100)) ++ bx("trak", mdia))
      ftyp ++ mdat ++ moov
    }
    // MJPEG-in-AVI: the RIFF twin of clip_mjpeg.mp4 — two frames
    // (photo.jpg, photo_prog.jpg: the same image under two encodings)
    // as bare JPEG bitstreams in `00dc` movi chunks; avih carries
    // geometry + 25 fps timing. Word alignment exercised for real:
    // photo_prog.jpg is odd-length, so its chunk takes a pad byte.
    val mjpegAvi = {
      def le32a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      def le16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
      def ck(id: String, body: Array[Byte]): Array[Byte] = {
        val base = id.getBytes("US-ASCII") ++ le32a(body.length) ++ body
        if (body.length % 2 == 1) base ++ Array[Byte](0) else base
      }
      def lst(typ: String, children: Array[Byte]): Array[Byte] =
        ck("LIST", typ.getBytes("US-ASCII") ++ children)
      val frames = Seq(jpg, jpgProg)
      val avih = ck("avih", le32a(40000) ++ le32a(0) ++ le32a(0) ++
        le32a(0) ++ le32a(frames.length) ++ le32a(0) ++ le32a(1) ++
        le32a(0) ++ le32a(16) ++ le32a(11) ++ new Array[Byte](16))
      val strh = ck("strh", "vids".getBytes("US-ASCII") ++
        "MJPG".getBytes("US-ASCII") ++ new Array[Byte](48))
      val strf = ck("strf", le32a(40) ++ le32a(16) ++ le32a(11) ++
        le16a(1) ++ le16a(24) ++ "MJPG".getBytes("US-ASCII") ++
        new Array[Byte](20))
      val hdrl = lst("hdrl", avih ++ lst("strl", strh ++ strf))
      val movi = lst("movi", frames.toArray.flatMap(f => ck("00dc", f)))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32a(body.length) ++ body
    }
    Map("img.ppm" -> ppm, "img.pgm" -> pgm, "img.bmp" -> bmp,
      "img.png" -> png, "clip.mp4" -> mp4, "photo.jpg" -> jpg,
      "photo_prog.jpg" -> jpgProg, "video.mp4" -> mp4box,
      "clip_mjpeg.mp4" -> mjpeg, "clip_mjpeg.avi" -> mjpegAvi)
  }

  private def be32r(v: Int): Array[Byte] = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16r(v: Int): Array[Byte] =
    Array[Byte]((v >> 8).toByte, v.toByte)

  // ---- EXIF fixture assembler ----------------------------------------

  private sealed trait Tv
  private case class TvShort(v: Int) extends Tv
  private case class TvShorts(vs: Seq[Int]) extends Tv
  private case class TvLong(v: Long) extends Tv
  private case class TvLongs(vs: Seq[Long]) extends Tv
  private case class TvAscii(s: String) extends Tv
  private case class TvRats(rs: Seq[(Long, Long)]) extends Tv
  private case class TvPtr(ifd: Int) extends Tv

  /** Assemble a TIFF block (either byte order) from tag lists — IFD 0
    * first, sub-IFDs (Exif/GPS) referenced via TvPtr by index. Each
    * IFD's out-of-line data sits directly after its entry table; the
    * layout pass sizes everything before the emit pass patches pointer
    * values. Independent by construction from the parser it feeds
    * (ops/Multimodal.parseTiffBlock walks, this builds). */
  private def tiffBlock(le: Boolean, ifds: Seq[Seq[(Int, Tv)]])
      : Array[Byte] = {
    def u16(v: Int): Array[Byte] =
      if (le) Array[Byte](v.toByte, (v >> 8).toByte)
      else Array[Byte]((v >> 8).toByte, v.toByte)
    def u32(v: Long): Array[Byte] =
      if (le) Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte)
      else Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
    def asciiBytes(s: String): Array[Byte] =
      s.getBytes("US-ASCII") ++ Array[Byte](0)
    def payloadSize(t: Tv): Int = t match {
      case TvAscii(s) =>
        val n = asciiBytes(s).length; if (n > 4) n else 0
      case TvRats(rs) => 8 * rs.size
      case TvShorts(vs) => if (2 * vs.size > 4) 2 * vs.size else 0
      case TvLongs(vs) => if (4 * vs.size > 4) 4 * vs.size else 0
      case _ => 0
    }
    val sizes = ifds.map { tags =>
      2 + 12 * tags.size + 4 + tags.map(t => payloadSize(t._2)).sum
    }
    val offsets = sizes.scanLeft(8L)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= (if (le) "II" else "MM").getBytes("US-ASCII")
    out ++= u16(42)
    out ++= u32(offsets(0))
    for ((tags, i) <- ifds.zipWithIndex) {
      var dataOff = offsets(i) + 2 + 12 * tags.size + 4
      val data = scala.collection.mutable.ArrayBuffer.empty[Byte]
      out ++= u16(tags.size)
      for ((tag, tv) <- tags) {
        out ++= u16(tag)
        tv match {
          case TvShort(v) =>
            out ++= u16(3); out ++= u32(1L); out ++= u16(v); out ++= u16(0)
          case TvLong(v) =>
            out ++= u16(4); out ++= u32(1L); out ++= u32(v)
          case TvPtr(j) =>
            out ++= u16(4); out ++= u32(1L); out ++= u32(offsets(j))
          case TvAscii(s) =>
            val bytes = asciiBytes(s)
            out ++= u16(2); out ++= u32(bytes.length.toLong)
            if (bytes.length <= 4) out ++= bytes.padTo(4, 0.toByte)
            else {
              out ++= u32(dataOff); data ++= bytes
              dataOff += bytes.length
            }
          case TvShorts(vs) =>
            out ++= u16(3); out ++= u32(vs.size.toLong)
            if (2 * vs.size <= 4) {
              vs.foreach(v => out ++= u16(v))
              out ++= Array.fill[Byte](4 - 2 * vs.size)(0)
            } else {
              out ++= u32(dataOff)
              vs.foreach(v => data ++= u16(v))
              dataOff += 2 * vs.size
            }
          case TvLongs(vs) =>
            out ++= u16(4); out ++= u32(vs.size.toLong)
            if (4 * vs.size <= 4) vs.foreach(v => out ++= u32(v))
            else {
              out ++= u32(dataOff)
              vs.foreach(v => data ++= u32(v))
              dataOff += 4 * vs.size
            }
          case TvRats(rs) =>
            out ++= u16(5); out ++= u32(rs.size.toLong)
            out ++= u32(dataOff)
            rs.foreach { case (n, d) =>
              data ++= u32(n); data ++= u32(d)
            }
            dataOff += 8 * rs.size
        }
      }
      out ++= u32(0L) // no next IFD
      out ++= data
    }
    out.toArray
  }

  private[graft] def exifFixtureSet: Map[String, Array[Byte]] =
    exifFixtures

  /** EXIF fixture set, assembled by [[tiffBlock]] (a builder, not the
    * parser): a little-endian APP1 with Exif + GPS sub-IFDs, a
    * big-endian APP1, a standalone TIFF, photo.jpg untouched (APP0
    * only → no EXIF), and a non-media blob. */
  private lazy val exifFixtures: Map[String, Array[Byte]] = {
    def app1Jpeg(block: Array[Byte]): Array[Byte] = {
      val payload = "Exif".getBytes("US-ASCII") ++
        Array[Byte](0, 0) ++ block
      val len = payload.length + 2
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
        (len >> 8).toByte, len.toByte) ++ payload ++
        mediaFixtures("photo.jpg").drop(2)
    }
    // GPS 37°46'30"N 122°25'6"W → floor-per-term micro-degrees
    // 37774999 / −122418332
    val le = tiffBlock(le = true, Seq(
      Seq(0x010F -> TvAscii("GraftCam"), 0x0110 -> TvAscii("GC-1"),
        0x0112 -> TvShort(6),
        0x0132 -> TvAscii("2026:01:02 03:04:05"),
        0x8769 -> TvPtr(1), 0x8825 -> TvPtr(2)),
      Seq(0xA002 -> TvLong(16), 0xA003 -> TvLong(11)),
      Seq(0x0001 -> TvAscii("N"),
        0x0002 -> TvRats(Seq((37L, 1L), (46L, 1L), (30L, 1L))),
        0x0003 -> TvAscii("W"),
        0x0004 -> TvRats(Seq((122L, 1L), (25L, 1L), (6L, 1L))))))
    val be = tiffBlock(le = false, Seq(
      Seq(0x010F -> TvAscii("MM-Cam"), 0x0110 -> TvAscii("X9"),
        0x0112 -> TvShort(3),
        0x0132 -> TvAscii("2025:12:31 23:59:58"),
        0x8769 -> TvPtr(1)),
      Seq(0xA002 -> TvLong(640), 0xA003 -> TvLong(480))))
    val tif = tiffBlock(le = true, Seq(
      Seq(0x0100 -> TvLong(800), 0x0101 -> TvLong(600),
        0x010F -> TvAscii("TiffCam"), 0x0112 -> TvShort(1))))
    Map("exif_le.jpg" -> app1Jpeg(le), "exif_be.jpg" -> app1Jpeg(be),
      "meta.tif" -> tif,
      "noexif.jpg" -> mediaFixtures("photo.jpg"),
      "note.txt" -> "plain text, no metadata".getBytes("US-ASCII"))
  }

  private[graft] def tiffRasterFixtureSet: Map[String, Array[Byte]] =
    tiffRasterFixtures

  /** Uncompressed-TIFF raster fixtures: the SAME pixel content as
    * img.bmp (2×2 red/green over blue/white) and img.pgm (1×2
    * black/white), so the cross-format luma/dhash-equality contract
    * extends to TIFF (ExifSpec pins it against the BMP/PNM decoders);
    * the RGB file uses TWO one-row strips to exercise strip walking,
    * and meta.tif (metadata, no raster) rides along to prove the
    * decoder declines it into the stub path. */
  private lazy val tiffRasterFixtures: Map[String, Array[Byte]] = {
    def withRaster(tags: Long => Seq[(Int, Tv)], raster: Array[Byte])
        : Array[Byte] = {
      // two-pass: block size is independent of the offset VALUES, so
      // build once with offset 0 to measure, then point at the raster
      val probe = tiffBlock(le = true, Seq(tags(0L)))
      tiffBlock(le = true, Seq(tags(probe.length.toLong))) ++ raster
    }
    // rows top-down: (red, green) / (blue, white), chunky RGB
    val rgbRaster = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    val rgb = withRaster(off => Seq(
      0x0100 -> TvLong(2), 0x0101 -> TvLong(2),
      0x0102 -> TvShorts(Seq(8, 8, 8)), 0x0103 -> TvShort(1),
      0x0106 -> TvShort(2),
      0x0111 -> TvLongs(Seq(off, off + 6L)),
      0x0115 -> TvShort(3), 0x0116 -> TvLong(1),
      0x0117 -> TvLongs(Seq(6L, 6L))), rgbRaster)
    val grayRaster = Array[Byte](0, 255.toByte)
    val gray = withRaster(off => Seq(
      0x0100 -> TvLong(1), 0x0101 -> TvLong(2),
      0x0102 -> TvShort(8), 0x0103 -> TvShort(1),
      0x0106 -> TvShort(1), 0x0111 -> TvLong(off),
      0x0115 -> TvShort(1), 0x0116 -> TvLong(2),
      0x0117 -> TvLong(2)), grayRaster)
    Map("img_rgb.tif" -> rgb, "img_gray.tif" -> gray,
      "meta.tif" -> exifFixtures("meta.tif"))
  }

  /** Uncompressed-TIFF decode as a driver-checked query: geometry +
    * mean luma + dhash of the strip-organized rasters through the real
    * binaryFile → decode path; the metadata-only TIFF falls through to
    * the deterministic stub (its row rides along, pinning the decline
    * path). VALUES oracle — luma is analytic (the rasters are the
    * BMP/PGM fixtures' pixels), dhash literals are the cross-format
    * grid hashes ExifSpec equates to the BMP/PNM decoders' output.
    */
  def qMultimodalTiff(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-tiff")
    tiffRasterFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.extractFeatures(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        round(col("mean_luma"), 6).as("luma_r6"),
        col("dhash"))
      .orderBy(col("file"))
  }

  /** EXIF/TIFF metadata harvest over the media lake — the camera-
    * metadata pass an image-curation pipeline runs before any pixel
    * decode (orientation fixing, capture-time partitioning, GPS
    * filtering). Real APP1/TIFF IFD walking in both byte orders
    * (ops/Multimodal.parseTiffBlock per TIFF 6.0 + CIPA DC-008);
    * files without EXIF keep their accounting row. Pinned VALUES
    * oracle — every field is a pure function of the fixture bytes.
    */
  def qMultimodalExif(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-exif")
    exifFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.extractExif(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("fmt"), col("has_exif"), col("byte_order"),
        col("orientation"), col("make"), col("model"), col("datetime"),
        col("pixel_x"), col("pixel_y"),
        col("gps_lat_micro"), col("gps_lon_micro"))
      .orderBy(col("file"))
  }

  /** REAL multimodal decode as a driver-checked query: materialize the
    * deterministic fixture set into a scratch dir, run the actual
    * binaryFile → mapPartitions decode path, emit per-file geometry +
    * 6-decimal mean luma. The oracle is a literal VALUES table — every
    * expected number is an analytic property of the fixture bytes
    * (dims/luma of known rasters; the stub's fingerprint-derived
    * features for the codec blob), so this pins the decoders
    * end-to-end under the driver's hash compare.
    */
  def qMultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("mm-decode")
    mediaFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    Multimodal.extractFeatures(media).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        round(col("mean_luma"), 6).as("luma_r6"))
      .orderBy(col("file"))
  }

  /** Deterministic fixtures for the perceptual-hash near-dup query:
    * an 18×16 horizontal gradient as PGM and as a bottom-up BMP (same
    * logical raster → IDENTICAL dHash across formats, exercising the
    * BMP row-flip), the gradient with one dark 2×2 corner patch (flips
    * exactly one dHash bit → Hamming 1), a vertical gradient (all
    * horizontal comparisons tie → hash 0), and column stripes (Hamming
    * 32 from both extremes). All analytic — the oracle pins the pair
    * list from pigeonhole-banded LSH + popcount.
    */
  // shared 18×16 analytic rasters (phash + animated-frame fixtures):
  // a horizontal gradient, the gradient with one dark corner patch
  // (exactly one dHash bit away), a vertical gradient (all horizontal
  // comparisons tie → dHash 0), and column stripes (far from all)
  private val fxW = 18
  private val fxH = 16
  private def fxGrad(x: Int, y: Int) = x * 14
  private def fxGrad2(x: Int, y: Int) = if (x >= 16 && y <= 1) 0 else x * 14
  private def fxGradv(x: Int, y: Int) = y * 15
  private def fxStripes(x: Int, y: Int) = if ((x / 2) % 2 == 0) 30 else 220

  private lazy val phashFixtures: Map[String, Array[Byte]] = {
    val w = fxW
    val h = fxH
    def pgm(px: (Int, Int) => Int): Array[Byte] =
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(w * h)(i => px(i % w, i / w).toByte)
    def grad(x: Int, y: Int) = fxGrad(x, y)
    def grad2(x: Int, y: Int) = fxGrad2(x, y)
    def gradv(x: Int, y: Int) = fxGradv(x, y)
    def stripes(x: Int, y: Int) = fxStripes(x, y)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val raster = Array.tabulate(h * rowSize) { i =>
      val row = i / rowSize
      val o = i % rowSize
      if (o >= w * 3) 0.toByte // padding
      else grad(o / 3, h - 1 - row).toByte // bottom-up, gray BGR
    }
    val bmp = "BM".getBytes("US-ASCII") ++
      le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ raster
    Map("grad.pgm" -> pgm(grad), "grad2.pgm" -> pgm(grad2),
      "gradv.pgm" -> pgm(gradv), "stripes.pgm" -> pgm(stripes),
      "grad.bmp" -> bmp)
  }

  /** ViT-style patch grid over the REAL P5 decode path
    * ([[graft.ops.Multimodal.grayPatches]]): the four deterministic
    * PGM fixtures tile into 6×6 patches (3×3 grid on 18×16 — bottom
    * row patches are 6×4, pinning the ceil-grid edge rule) and emit
    * exact integer gray sums; the BMP fixture must decline (P5-only
    * decode subset) — certified by the oracle's row count. The twin
    * regenerates every pixel from the SAME formulas the fixture
    * builder tabulates (fxGrad/fxGrad2/fxGradv/fxStripes) and re-tiles
    * them relationally.
    */
  def qMultimodalPatches(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-patch")
    phashFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    Multimodal.grayPatches(
        Multimodal.readBinary(spark, s"$scratch/*"), patch = 6).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("py"), col("px"), col("n_px"), col("sum_gray"))
      .orderBy(col("file"), col("py"), col("px"))
  }

  /** Perceptual near-dup pairs over the dHash fixture set: REAL decode
    * → 9×8 luma grid → 64-bit dHash → pigeonhole-banded LSH join →
    * exact popcount filter (Multimodal.imageNearDupPairs). Pinned
    * VALUES oracle: the gradient PGM and its BMP re-encode collide at
    * Hamming 0 (cross-format perceptual identity), the corner-patched
    * variant sits at Hamming 1 from both, and the control images pair
    * with nothing.
    */
  def qMultimodalPhash(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-phash")
    phashFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val feats = Multimodal.extractFeatures(
        Multimodal.readBinary(spark, s"$scratch/*")).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("dhash"))
    Multimodal.imageNearDupPairs(feats, "file", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Image near-dup CLUSTERS: the dHash LSH pairs fed through the same
    * pointer-doubling connected components the text dedup uses
    * (Dedup.dedupComponents) — cross-format re-encodes and
    * small edits collapse into one cluster keyed by its min-id
    * representative, exactly the keep-one-per-cluster step of an
    * image curation pipeline.
    */
  def qMultimodalPhashCluster(spark: SparkSession, dir: String)
      : DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-phc")
    phashFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val feats = Multimodal.extractFeatures(
        Multimodal.readBinary(spark, s"$scratch/*")).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("dhash"))
    val pairs = Multimodal.imageNearDupPairs(feats, "file",
      maxHamming = 3)
    graft.ops.Dedup.dedupComponents(pairs, iters = 4)
      .groupBy(col("component").as("label"))
      .agg(count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("members"))
      .orderBy(col("label"))
  }

  /** Minimal deterministic GIF89a encoder for the frame fixtures: a
    * 256-entry grayscale global palette (index i = gray i, so Rec.601
    * luma of a pixel IS its index), full-size frames, and an LZW
    * stream of pure literal codes with a CLEAR every 200 pixels — the
    * classic "uncompressed LZW" construction, which keeps the
    * dictionary under 512 entries so the code width is a constant 9
    * bits. Byte-deterministic by construction (no library, no
    * timestamps), so the decoded per-frame features are pinnable
    * oracle expectations.
    */
  private def grayGif(w: Int, h: Int,
                      frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 256 entries
    out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    frames.foreach { px =>
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(8) // min LZW code size → 9-bit codes, CLEAR=256, EOI=257
      val codes = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nbits = 0
      def emit(code: Int): Unit = {
        acc |= (code.toLong << nbits); nbits += 9
        while (nbits >= 8) {
          codes.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
        }
      }
      emit(256)
      var n = 0
      for (y <- 0 until h; x <- 0 until w) {
        if (n == 200) { emit(256); n = 0 } // dictionary stays < 512
        emit(px(x, y) & 0xff); n += 1
      }
      emit(257)
      if (nbits > 0) codes.write((acc & 0xff).toInt)
      val bytes = codes.toByteArray
      bytes.grouped(255).foreach { blk =>
        out.write(blk.length); out.write(blk, 0, blk.length)
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** 4-frame animated GIF from the shared analytic rasters, plus the
    * static gradient PGM — lets the frame queries show image↔video
    * frame dedup across containers.
    */
  private lazy val frameFixtures: Map[String, Array[Byte]] = {
    def pgm(px: (Int, Int) => Int): Array[Byte] =
      s"P5\n$fxW $fxH\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(fxW * fxH)(i => px(i % fxW, i / fxW).toByte)
    Map("anim.gif" -> grayGif(fxW, fxH,
        Seq(fxGrad, fxGrad2, fxGradv, fxStripes)),
      "still.pgm" -> pgm(fxGrad))
  }

  /** Frame-level features of an animated GIF: REAL container walk +
    * per-frame LZW decode (Multimodal.extractGifFrames) over a
    * byte-deterministic fixture. The oracle is a literal VALUES table —
    * each luma is the analytic mean of its known raster (gray palette ⇒
    * luma = pixel/255), pinning the multi-frame decode end-to-end.
    */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-frames")
    frameFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    Multimodal.extractGifFrames(
        Multimodal.readBinary(spark, s"$scratch/*.gif")).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("mean_luma"), 6).as("luma_r6"))
      .orderBy(col("file"), col("frame_idx"))
  }

  /** Unified KEYFRAME table across container kinds: real per-frame LZW
    * decode for the animated GIF, REAL JPEG decode for the MJPEG-in-MP4
    * clip (container layout + JPEG decoder compose — its keyframe row
    * carries photo.jpg's decoded luma/dhash), and deterministic stub
    * keyframes only for the inter-frame-codec blob
    * (Multimodal.extractVideoKeyframes, stride 32 — the frame-SAMPLING
    * contract: per-file fan-out is n_frames/stride, here 127/32 → 4
    * stub video rows + the GIF's frame 0 + 1 decoded MJPEG row).
    * Every number is pinned: GIF geometry/luma are analytic properties
    * of the fixture raster; the stub rows are pure functions of
    * fnv1a64([1,2,3] ‖ idx) — file-level n_frames (127) agrees with
    * q_multimodal_decode's by construction.
    */
  def qMultimodalVideo(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-video")
    frameFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    java.nio.file.Files.write(scratch.resolve("clip.mp4"),
      Array[Byte](1, 2, 3))
    // the REAL-container video: keyframe positions come from its stss
    // sync table (samples {1,9,17} → indices {0,8,16}); stride 32
    // subsamples that list to just index 0
    java.nio.file.Files.write(scratch.resolve("video.mp4"),
      mediaFixtures("video.mp4"))
    // the DECODABLE video: MJPEG samples, so its keyframe rows carry
    // REAL decoded luma/dhash (= photo.jpg's, every frame is that
    // image); stride 32 subsamples syncs {1,3} to just sample 1
    java.nio.file.Files.write(scratch.resolve("clip_mjpeg.mp4"),
      mediaFixtures("clip_mjpeg.mp4"))
    // the RIFF twin: both MJPEG frames are keyframes; stride 32 keeps
    // frame 0 only
    java.nio.file.Files.write(scratch.resolve("clip_mjpeg.avi"),
      mediaFixtures("clip_mjpeg.avi"))
    Multimodal.extractVideoKeyframes(
        Multimodal.readBinary(spark, s"$scratch/*.{gif,mp4,avi}"),
        stride = 32).toDF()
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("mean_luma"), 6).as("luma_r6"),
        col("dhash"))
      .orderBy(col("file"), col("frame_idx"))
  }

  /** Frame-level near-dup pairs ACROSS media kinds: GIF frames and
    * still images share one dHash space (id = file#frame), so the
    * pigeonhole-banded LSH join finds the still gradient colliding with
    * the gradient frame at Hamming 0 and the corner-patched frame at 1
    * — the scene-dedup / thumbnail-vs-video matching step of a
    * multimodal curation pipeline, with no all-pairs comparison.
    */
  def qMultimodalFrameDedup(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-fdedup")
    frameFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    val media = Multimodal.readBinary(spark, s"$scratch/*")
    val gifFrames = Multimodal.extractGifFrames(media).toDF()
      .select(concat(element_at(split(col("path"), "/"), -1),
          lit("#"), col("frame_idx")).as("id"), col("dhash"))
    val stills = Multimodal.extractFeatures(
        media.filter(!col("path").endsWith(".gif"))).toDF()
      .select(concat(element_at(split(col("path"), "/"), -1),
          lit("#0")).as("id"), col("dhash"))
    Multimodal.imageNearDupPairs(gifFrames.unionByName(stills), "id",
        maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SCENE-CUT detection across container kinds: the animated GIF's
    * four frames cut exactly where the content changes beyond the
    * threshold (gradient → corner-patch is Hamming 1, NO cut; patch →
    * vertical gradient and vertical → stripes are far, cuts), while
    * the MJPEG clip's keyframes — all decoding to the same image —
    * produce none. One windowed pass over the unified keyframe table's
    * 8-byte hashes; pixels are never revisited.
    */
  def qMultimodalSceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("mm-scenes")
    frameFixtures.foreach { case (name, bytes) =>
      java.nio.file.Files.write(scratch.resolve(name), bytes)
    }
    java.nio.file.Files.write(scratch.resolve("clip_mjpeg.mp4"),
      mediaFixtures("clip_mjpeg.mp4"))
    val frames = Multimodal.extractVideoKeyframes(
      Multimodal.readBinary(spark, s"$scratch/*.{gif,mp4,avi}"), stride = 1)
    Multimodal.sceneCuts(frames.toDF(), threshold = 16)
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("from_idx").cast("long").as("from_idx"),
        col("cut_idx").cast("long").as("cut_idx"), col("dist"))
      .orderBy(col("file"), col("cut_idx"))
  }

  /** Weighted geometric mean of price (weight = quantity) per flag —
    * the typed-Aggregator exemplar from SURVEY §2-B. Output rounded to 4
    * decimals: ln/exp differ across libms at ulp level (like q_func_math's
    * price_ln), far below the rounding threshold.
    */
  def qCustomGeomean(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(round(
        graft.functions.WeightedGeoMeanAgg.asUdaf(
          col("l_extendedprice"), col("l_quantity")), 4).as("geo_price"))
      .orderBy(col("l_returnflag"))
  }

  val defs: Map[String, Q] = Map(
    "q_custom_geomean" -> (qCustomGeomean(_, _)),
    "q_custom_cosine_expr" -> (qCustomCosineExpr(_, _)),
    "q_custom_simhash_agg" -> (qCustomSimhashAgg(_, _)),
    "q_custom_udf_entropy" -> (qCustomUdfEntropy(_, _)),
    "q_multimodal_features" -> (qMultimodalFeatures(_, _)),
    "q_multimodal_audio" -> (qMultimodalAudio(_, _)),
    "q_multimodal_vad" -> (qMultimodalVad(_, _)),
    "q_multimodal_patches" -> (qMultimodalPatches(_, _)),
    "q_multimodal_goertzel" -> (qMultimodalGoertzel(_, _)),
    "q_multimodal_spectrogram" -> (qMultimodalSpectrogram(_, _)),
    "q_multimodal_audio_dedup" -> (qMultimodalAudioDedup(_, _)),
    "q_multimodal_scene_cuts" -> (qMultimodalSceneCuts(_, _)),
    "q_multimodal_decode" -> (qMultimodalDecode(_, _)),
    "q_multimodal_exif" -> (qMultimodalExif(_, _)),
    "q_multimodal_tiff" -> (qMultimodalTiff(_, _)),
    "q_multimodal_phash" -> (qMultimodalPhash(_, _)),
    "q_multimodal_phash_cluster" -> (qMultimodalPhashCluster(_, _)),
    "q_multimodal_frames" -> (qMultimodalFrames(_, _)),
    "q_multimodal_frame_dedup" -> (qMultimodalFrameDedup(_, _)),
    "q_multimodal_video" -> (qMultimodalVideo(_, _))
  )

  val oracles: Map[String, String] = Map(
    // luma is analytic (rgb: (0.299+0.587+0.114+1)/4 = 0.5 exactly;
    // gray: (0+1)/2); dhash literals equal the BMP/PNM decoders' output
    // on the identical rasters (ExifSpec pins the equality); meta.tif
    // pins the stub-decline path
    "q_multimodal_tiff" ->
      """SELECT * FROM (VALUES
        |  ('img_gray.tif', CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), 0.5, CAST(0 AS BIGINT)),
        |  ('img_rgb.tif', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), 0.5, CAST(34359738376 AS BIGINT)),
        |  ('meta.tif', CAST(851 AS BIGINT), CAST(426 AS BIGINT),
        |   CAST(88 AS BIGINT), 0.560784, CAST(8147216232738344396
        |     AS BIGINT))
        |) AS t(file, width, height, n_frames, luma_r6, dhash)
        |ORDER BY file""".stripMargin,
    // every field is an analytic property of the assembled fixture
    // bytes (tag values placed by the builder, micro-degrees from the
    // documented floor-per-term reduction)
    "q_multimodal_exif" ->
      """SELECT * FROM (VALUES
        |  ('exif_be.jpg', 'jpeg', true, 'MM', CAST(3 AS BIGINT),
        |   'MM-Cam', 'X9', '2025:12:31 23:59:58',
        |   CAST(640 AS BIGINT), CAST(480 AS BIGINT),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('exif_le.jpg', 'jpeg', true, 'II', CAST(6 AS BIGINT),
        |   'GraftCam', 'GC-1', '2026:01:02 03:04:05',
        |   CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(37774999 AS BIGINT), CAST(-122418332 AS BIGINT)),
        |  ('meta.tif', 'tiff', true, 'II', CAST(1 AS BIGINT),
        |   'TiffCam', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |   CAST(800 AS BIGINT), CAST(600 AS BIGINT),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('noexif.jpg', 'jpeg', false, CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('note.txt', 'other', false, CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
        |) AS t(file, fmt, has_exif, byte_order, orientation, make,
        |       model, datetime, pixel_x, pixel_y, gps_lat_micro,
        |       gps_lon_micro)
        |ORDER BY file""".stripMargin,
    // Pinned-expectation oracle: every number is an analytic property
    // of the deterministic fixture bytes (see mediaFixtures scaladoc).
    // PPM {red,green,blue,white}, PGM {black,white} and BMP
    // {blue,white,red,green} all have Rec.601 mean luma exactly 0.5;
    // the PNG's pattern sums to 0.489162 (r6); the mp4 blob's stub
    // features derive from fnv1a64([1,2,3]) = 0x21d5... (width
    // 320+(h%1600), height 240+((h>>>11)%900), frames 1+((h>>>23)%240),
    // luma ((h>>>33)%256)/255 → 0.047059).
    "q_multimodal_decode" ->
      """SELECT * FROM (VALUES
        |  ('clip.mp4', CAST(1387 AS BIGINT), CAST(574 AS BIGINT),
        |   CAST(127 AS BIGINT), CAST(0.047059 AS DOUBLE)),
        |  ('clip_mjpeg.avi', CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(0.499242 AS DOUBLE)),
        |  ('clip_mjpeg.mp4', CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(3 AS BIGINT), CAST(0.499242 AS DOUBLE)),
        |  ('img.bmp', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |  ('img.pgm', CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |  ('img.png', CAST(3 AS BIGINT), CAST(5 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.489162 AS DOUBLE)),
        |  ('img.ppm', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |  ('photo.jpg', CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.499242 AS DOUBLE)),
        |  ('photo_prog.jpg', CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(0.499242 AS DOUBLE)),
        |  ('video.mp4', CAST(64 AS BIGINT), CAST(48 AS BIGINT),
        |   CAST(24 AS BIGINT), CAST(0.745098 AS DOUBLE)))
        |  AS t(file, width, height, n_frames, luma_r6)
        |ORDER BY file""".stripMargin,
    // Pinned-expectation oracle over the fixture set: geometry/resize
    // plan/sampled-frame counts are analytic; the FNV-1a fingerprints
    // are pure functions of the fixed bytes, captured once and pinned
    // (decode is deterministic, so any drift is a real regression).
    "q_multimodal_features" ->
      """SELECT * FROM (VALUES
        |  ('clip.mp4', CAST(3 AS BIGINT),
        |   CAST(-3410805910829992533 AS BIGINT), CAST(1387 AS BIGINT),
        |   CAST(574 AS BIGINT), CAST(512 AS BIGINT), CAST(211 AS BIGINT),
        |   CAST(127 AS BIGINT), CAST(5 AS BIGINT)),
        |  ('clip_mjpeg.avi', CAST(1534 AS BIGINT),
        |   CAST(-7703832871093461287 AS BIGINT), CAST(16 AS BIGINT),
        |   CAST(11 AS BIGINT), CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('clip_mjpeg.mp4', CAST(2470 AS BIGINT),
        |   CAST(2296709179991697951 AS BIGINT), CAST(16 AS BIGINT),
        |   CAST(11 AS BIGINT), CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('img.bmp', CAST(70 AS BIGINT),
        |   CAST(-327462689767258727 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('img.pgm', CAST(13 AS BIGINT),
        |   CAST(5276587552098029246 AS BIGINT), CAST(1 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('img.png', CAST(100 AS BIGINT),
        |   CAST(1038414795502864256 AS BIGINT), CAST(3 AS BIGINT),
        |   CAST(5 AS BIGINT), CAST(3 AS BIGINT), CAST(5 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('img.ppm', CAST(23 AS BIGINT),
        |   CAST(-9145406516417166057 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('photo.jpg', CAST(698 AS BIGINT),
        |   CAST(5203158787540282694 AS BIGINT), CAST(16 AS BIGINT),
        |   CAST(11 AS BIGINT), CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('photo_prog.jpg', CAST(595 AS BIGINT),
        |   CAST(4683803815571080072 AS BIGINT), CAST(16 AS BIGINT),
        |   CAST(11 AS BIGINT), CAST(16 AS BIGINT), CAST(11 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('video.mp4', CAST(407 AS BIGINT),
        |   CAST(5230400443617160721 AS BIGINT), CAST(64 AS BIGINT),
        |   CAST(48 AS BIGINT), CAST(64 AS BIGINT), CAST(48 AS BIGINT),
        |   CAST(24 AS BIGINT), CAST(1 AS BIGINT)))
        |  AS t(file, length, fingerprint, width, height,
        |       out_width, out_height, n_frames, n_sampled)
        |ORDER BY file""".stripMargin,
    // Pinned audio oracle: header fields and durations are analytic
    // (tone 2000/8000 s; st 2/4000 s; ima 505/8000 s; the mp3 blob's
    // stub features derive from its FNV hash); RMS/peak are the
    // deterministic decode outputs rounded to 6 decimals.
    "q_multimodal_goertzel" -> goertzelOracleSql,
    "q_multimodal_spectrogram" -> spectrogramOracleSql,
    // pixel formulas in lockstep with fxGrad/fxGrad2/fxGradv/fxStripes
    // (the same tabulate the fixture builder runs); BMP absent = the
    // P5-only decline, certified by row count
    "q_multimodal_patches" ->
      s"""WITH px AS (
         |  SELECT f.file, x.x, y.y,
         |    CASE f.file
         |      WHEN 'grad.pgm' THEN x.x * 14
         |      WHEN 'grad2.pgm' THEN
         |        CASE WHEN x.x >= 16 AND y.y <= 1 THEN 0
         |             ELSE x.x * 14 END
         |      WHEN 'gradv.pgm' THEN y.y * 15
         |      ELSE CASE WHEN (x.x // 2) % 2 = 0 THEN 30 ELSE 220 END
         |    END AS g
         |  FROM (VALUES ('grad.pgm'), ('grad2.pgm'), ('gradv.pgm'),
         |        ('stripes.pgm')) f(file),
         |       (SELECT unnest(generate_series(0, ${fxW - 1})) AS x) x,
         |       (SELECT unnest(generate_series(0, ${fxH - 1})) AS y) y)
         |SELECT file, CAST(y // 6 AS BIGINT) AS py,
         |  CAST(x // 6 AS BIGINT) AS px, count(*) AS n_px,
         |  CAST(sum(g) AS BIGINT) AS sum_gray
         |FROM px GROUP BY file, y // 6, x // 6
         |ORDER BY file, py, px""".stripMargin,
    "q_multimodal_vad" -> {
      // window energies regenerated from the SAME vadPattern script and
      // period tables the fixture builder tiles — then the identical
      // threshold + gaps-and-islands replay
      val pat = vadPattern.zipWithIndex
        .map { case (k, i) => s"($i, '$k')" }.mkString(", ")
      def sq(period: Seq[Int]) = period.mkString("[", ", ", "]")
      s"""WITH pat(widx, kind) AS (VALUES $pat),
         |en AS (
         |  SELECT CAST(widx AS BIGINT) AS widx, CASE kind
         |    WHEN 'v' THEN CAST(25 AS BIGINT) * list_sum(list_transform(
         |      ${sq(vadVoicePeriod)}, x -> CAST(x AS BIGINT) * x))
         |    WHEN 'h' THEN CAST(25 AS BIGINT) * list_sum(list_transform(
         |      ${sq(vadHumPeriod)}, x -> CAST(x AS BIGINT) * x))
         |    ELSE CAST(0 AS BIGINT) END AS energy
         |  FROM pat),
         |act AS (SELECT widx, energy FROM en
         |        WHERE energy >= 1000000000),
         |isl AS (SELECT widx, energy,
         |          widx - row_number() OVER (ORDER BY widx) AS grp
         |        FROM act)
         |SELECT 'speech.wav' AS file, min(widx) AS seg_start,
         |  max(widx) AS seg_end, count(*) AS n_windows,
         |  CAST(sum(energy) AS BIGINT) AS energy_sum
         |FROM isl GROUP BY grp
         |ORDER BY file, seg_start""".stripMargin
    },
    "q_multimodal_audio" ->
      """SELECT * FROM (VALUES
        |  ('ima.wav', CAST(300 AS BIGINT),
        |   CAST(6451195474904177017 AS BIGINT), CAST(8000 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(505 AS BIGINT),
        |   CAST(0.063125 AS DOUBLE), CAST(0.787718 AS DOUBLE),
        |   CAST(1.0 AS DOUBLE)),
        |  ('st.wav', CAST(48 AS BIGINT),
        |   CAST(4312811095252246342 AS BIGINT), CAST(4000 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(0.0005 AS DOUBLE), CAST(0.747402 AS DOUBLE),
        |   CAST(1.0 AS DOUBLE)),
        |  ('tone.wav', CAST(4056 AS BIGINT),
        |   CAST(-4649843792192410495 AS BIGINT), CAST(8000 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(2000 AS BIGINT),
        |   CAST(0.25 AS DOUBLE), CAST(0.353526 AS DOUBLE),
        |   CAST(0.499969 AS DOUBLE)),
        |  ('x.mp3', CAST(6 AS BIGINT),
        |   CAST(4343116417353483756 AS BIGINT), CAST(16000 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(91220 AS BIGINT),
        |   CAST(5.63875 AS DOUBLE), CAST(0.1475 AS DOUBLE),
        |   CAST(0.755 AS DOUBLE)))
        |  AS t(file, length, fingerprint, sample_rate, channels,
        |       n_frames, duration_s, rms_r6, peak_r6)
        |ORDER BY file""".stripMargin,
    // Analytic pinned pairs (see phashFixtures scaladoc): the PGM/BMP
    // gradient twins at Hamming 0, the corner-patched variant at 1.
    "q_multimodal_phash" ->
      """SELECT * FROM (VALUES
        |  ('grad.bmp', 'grad.pgm', CAST(0 AS BIGINT)),
        |  ('grad.bmp', 'grad2.pgm', CAST(1 AS BIGINT)),
        |  ('grad.pgm', 'grad2.pgm', CAST(1 AS BIGINT)))
        |  AS t(id_a, id_b, hamming)
        |ORDER BY id_a, id_b""".stripMargin,
    // The three gradient variants collapse into one cluster under the
    // min-id representative; the control images pair with nothing and
    // so form no cluster.
    "q_multimodal_phash_cluster" ->
      """SELECT * FROM (VALUES
        |  ('grad.bmp', CAST(3 AS BIGINT),
        |   'grad.bmp,grad.pgm,grad2.pgm'))
        |  AS t(label, n_members, members)
        |ORDER BY label""".stripMargin,
    // Analytic per-frame expectations: gray palette ⇒ luma = mean
    // pixel/255 of each known raster (grad 119/255, grad2 33348/73440,
    // gradv 112.5/255, stripes (2060/18)/255).
    "q_multimodal_frames" ->
      """SELECT * FROM (VALUES
        |  ('anim.gif', CAST(0 AS BIGINT), CAST(18 AS BIGINT),
        |   CAST(16 AS BIGINT), 0.466667),
        |  ('anim.gif', CAST(1 AS BIGINT), CAST(18 AS BIGINT),
        |   CAST(16 AS BIGINT), 0.454085),
        |  ('anim.gif', CAST(2 AS BIGINT), CAST(18 AS BIGINT),
        |   CAST(16 AS BIGINT), 0.441176),
        |  ('anim.gif', CAST(3 AS BIGINT), CAST(18 AS BIGINT),
        |   CAST(16 AS BIGINT), 0.448802))
        |  AS t(file, frame_idx, width, height, luma_r6)
        |ORDER BY file, frame_idx""".stripMargin,
    // The still gradient collides with its GIF-frame twin at Hamming 0,
    // the corner-patched frame sits at 1 from both; the vertical
    // gradient (dHash 0) and stripes pair with nothing.
    "q_multimodal_frame_dedup" ->
      """SELECT * FROM (VALUES
        |  ('anim.gif#0', 'anim.gif#1', CAST(1 AS BIGINT)),
        |  ('anim.gif#0', 'still.pgm#0', CAST(0 AS BIGINT)),
        |  ('anim.gif#1', 'still.pgm#0', CAST(1 AS BIGINT)))
        |  AS t(id_a, id_b, hamming)
        |ORDER BY id_a, id_b""".stripMargin,
    // Pinned keyframe oracle: the GIF row is analytic (18×16 gradient,
    // luma 119/255; dHash −1 because a horizontal gradient's luma rises
    // monotonically across every cell pair → all 64 difference bits
    // set); the clip.mp4 rows are pure functions of
    // fnv1a64([1,2,3] ‖ idx_le32) through the documented stub formulas
    // (stride 32 over the 127 stub frames → idx 0,32,64,96).
    "q_multimodal_video" ->
      """SELECT * FROM (VALUES
        |  ('anim.gif', CAST(0 AS BIGINT), CAST(18 AS BIGINT),
        |   CAST(16 AS BIGINT), CAST(0.466667 AS DOUBLE),
        |   CAST(-1 AS BIGINT)),
        |  ('clip.mp4', CAST(0 AS BIGINT), CAST(1387 AS BIGINT),
        |   CAST(574 AS BIGINT), CAST(0.886275 AS DOUBLE),
        |   CAST(7295880347511526764 AS BIGINT)),
        |  ('clip.mp4', CAST(32 AS BIGINT), CAST(1387 AS BIGINT),
        |   CAST(574 AS BIGINT), CAST(0.364706 AS DOUBLE),
        |   CAST(8598033544978976464 AS BIGINT)),
        |  ('clip.mp4', CAST(64 AS BIGINT), CAST(1387 AS BIGINT),
        |   CAST(574 AS BIGINT), CAST(0.929412 AS DOUBLE),
        |   CAST(8270250090930644038 AS BIGINT)),
        |  ('clip.mp4', CAST(96 AS BIGINT), CAST(1387 AS BIGINT),
        |   CAST(574 AS BIGINT), CAST(0.407843 AS DOUBLE),
        |   CAST(-726934233687745871 AS BIGINT)),
        |  ('clip_mjpeg.avi', CAST(0 AS BIGINT), CAST(16 AS BIGINT),
        |   CAST(11 AS BIGINT), CAST(0.499242 AS DOUBLE),
        |   CAST(-578712562351212553 AS BIGINT)),
        |  ('clip_mjpeg.mp4', CAST(0 AS BIGINT), CAST(16 AS BIGINT),
        |   CAST(11 AS BIGINT), CAST(0.499242 AS DOUBLE),
        |   CAST(-578712562351212553 AS BIGINT)),
        |  ('video.mp4', CAST(0 AS BIGINT), CAST(64 AS BIGINT),
        |   CAST(48 AS BIGINT), CAST(0.431373 AS DOUBLE),
        |   CAST(-3339984164019236698 AS BIGINT)))
        |  AS t(file, frame_idx, width, height, luma_r6, dhash)
        |ORDER BY file, frame_idx""".stripMargin,
    // Pinned cuts: gradient→patch is Hamming 1 (below threshold, no
    // cut); patch→vertical (63) and vertical→stripes (32) cut; the
    // MJPEG clip's identical keyframes contribute nothing.
    "q_multimodal_scene_cuts" ->
      """SELECT * FROM (VALUES
        |  ('anim.gif', CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(63 AS BIGINT)),
        |  ('anim.gif', CAST(2 AS BIGINT), CAST(3 AS BIGINT),
        |   CAST(32 AS BIGINT)))
        |  AS t(file, from_idx, cut_idx, dist)
        |ORDER BY file, cut_idx""".stripMargin,
    // Pinned pair list: the dropout copy (one attenuated window flips
    // the two adjacent energy comparisons → Hamming 2) pairs with its
    // original; the different-envelope recording exceeds the budget;
    // the non-PCM blob contributes no hash row at all.
    "q_multimodal_audio_dedup" ->
      """SELECT * FROM (VALUES
        |  ('beat_a.wav', 'beat_b.wav', CAST(2 AS BIGINT)))
        |  AS t(id_a, id_b, hamming)
        |ORDER BY id_a, id_b""".stripMargin,
    // Same oracle as q_dedup_embedding: the native expression must be
    // bit-identical to the HOF formulation (same op order).
    "q_custom_cosine_expr" -> DedupQueries.oracles("q_dedup_embedding"),
    // The Aggregator's hash family is identical to Dedup.simhash's; only
    // the id column name differs between the two registered queries.
    "q_custom_simhash_agg" -> DedupQueries.oracles("q_dedup_simhash")
      .replace("AS id,", "AS doc_id,").replace("ORDER BY id", "ORDER BY doc_id"),
    "q_custom_udf_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, length(text) AS n,
        |    unnest(string_split(text, '')) AS c
        |  FROM documents),
        |freq AS (
        |  SELECT doc_id, n, c, COUNT(*) AS cnt
        |  FROM ch GROUP BY doc_id, n, c)
        |SELECT doc_id,
        |  round(-SUM((cnt / CAST(n AS DOUBLE))
        |    * ln(cnt / CAST(n AS DOUBLE)) / ln(2)), 6) AS entropy
        |FROM freq GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_custom_geomean" ->
      """SELECT l_returnflag,
        |  round(exp(SUM(l_quantity * ln(l_extendedprice))
        |    / SUM(l_quantity)), 4) AS geo_price
        |FROM lineitem
        |WHERE l_extendedprice > 0 AND l_quantity > 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
