package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: opaque `binary`
  * payloads + typed metadata, with decode/feature steps shaped for scale.
  *
  * The Spark-side plumbing here is real — binaryFile ingest, schema,
  * partition-batched decode via mapPartitions (the Scala analog of a
  * batched Pandas UDF: one decoder instance per partition, not per row) —
  * while the pixel/sample decode itself is a clearly-marked deterministic
  * STUB (`fakeDecode`): no image/audio codecs exist in this environment.
  * Swapping in a real codec changes only the body of `fakeDecode`.
  */
object Multimodal {

  case class MediaFile(path: String, modificationTime: Timestamp,
                       length: Long, content: Array[Byte])

  case class MediaFeatures(path: String, length: Long, fingerprint: Long,
                           width: Int, height: Int, n_frames: Int,
                           mean_luma: Double)

  /** Ingest a directory of opaque media blobs. `binaryFile` gives
    * (path, modificationTime, length, content) with partitioning by file —
    * at 100 TB, set `spark.sql.files.maxPartitionBytes` so one task holds
    * a bounded number of blobs.
    */
  def readBinary(spark: SparkSession, pathGlob: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob).as[MediaFile]
  }

  /** ======== STUB ========
    * Deterministic fake decoder: derives "image" properties from a 64-bit
    * fingerprint of the bytes. A real implementation would decode
    * `content` with a codec library here (and is exactly why this runs in
    * mapPartitions: codec contexts are expensive, reuse them per
    * partition, not per row).
    */
  private[ops] def fakeDecode(m: MediaFile): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < m.content.length) {
      h ^= (m.content(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    MediaFeatures(
      path = m.path, length = m.length, fingerprint = h,
      width = 320 + (((h % 1600) + 1600) % 1600).toInt,
      height = 240 + (((h >>> 11) % 900)).toInt,
      n_frames = 1 + ((h >>> 23) % 240).toInt,
      mean_luma = ((h >>> 33) % 256).toDouble / 255.0)
  }

  /** Batched decode/feature-extract. One decoder per partition; rows
    * stream through without materializing the partition.
    */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs: initialize decoder context here, once per partition
      it.map(fakeDecode)
    }
  }

  /** Frame sampling plan: every `stride`-th frame index, as a column op
    * on the already-extracted metadata (no second decode pass).
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("sampled_frames",
      sequence(lit(0), col("n_frames") - 1, lit(stride)))

  /** Resize plan: aspect-preserving fit into a `maxDim` bounding box —
    * the target-geometry computation every image pipeline needs before
    * the pixel pass. Pure integer column math (scale num/denominator kept
    * exact; floor semantics match PIL/OpenCV's default): emits
    * out_width/out_height and the scale as a ratio. The pixel resample
    * itself belongs in the mapPartitions decode step (same codec-context
    * reuse as fakeDecode) — geometry is engine-side so the planner can
    * partition/batch on output size.
    */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val longSide = greatest(w, h)
    val needs = longSide > maxDim
    features
      .withColumn("out_width",
        when(needs, (w * maxDim) / longSide).otherwise(w)
          .cast("int"))
      .withColumn("out_height",
        when(needs, (h * maxDim) / longSide).otherwise(h)
          .cast("int"))
      .withColumn("resized", needs)
  }
}
