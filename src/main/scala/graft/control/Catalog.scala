package graft.control

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** File/pipeline catalog — the engine's analog of the reference's MySQL
  * metadata tables (/root/reference/app/models.py:6-25).
  *
  * Status domain reproduces the reference's state machine exactly
  * (/root/reference/app/routes.py:104,122,144 +
  * /root/reference/app/utils/airflow_client.py:30):
  * `uploaded | processing | waiting | queued | running | success | failed`.
  * Unlike the reference — whose poll guard `status=='processing'` can stick
  * a row in a non-terminal state forever (routes.py:141-145) — status here
  * is driven by SparkListener callbacks (StatusListener), so terminal
  * states always land.
  */
object Catalog {
  val statuses: Set[String] = Set(
    "uploaded", "processing", "waiting", "queued", "running",
    "success", "failed")

  case class FileEntry(
      user_id: Long,
      filename: String,
      file_type: String,
      status: String,
      dag_id: Option[String],
      created_at: Timestamp)

  def empty(spark: SparkSession): Dataset[FileEntry] = {
    import spark.implicits._
    spark.emptyDataset[FileEntry]
  }

  /** Ingest-time catalog insert: data files enter as `uploaded`, pipeline
    * submissions as `processing` (reference semantics,
    * /root/reference/app/routes.py:100-125). File type = lower-cased
    * extension, `unknown` if none.
    */
  def register(spark: SparkSession, userId: Long, filename: String,
               pipeline: Option[String], now: Timestamp): FileEntry =
    FileEntry(
      user_id = userId,
      filename = filename,
      file_type = graft.io.LakeIO.extensionOf(filename),
      status = if (pipeline.isDefined) "processing" else "uploaded",
      dag_id = pipeline,
      created_at = now)

  /** Per-tenant catalog scan — the reference's dashboard query
    * (`File.query.filter_by(user_id=...)`,
    * /root/reference/app/routes.py:56-60).
    */
  def forUser(catalog: DataFrame, userId: Long): DataFrame =
    catalog.filter(col("user_id") === userId)

  /** Join catalog rows with live pipeline states (from StatusListener):
    * the engine's `/results` — one join instead of the reference's
    * N+1 poll-and-commit loop (/root/reference/app/routes.py:137-146).
    */
  def withLiveStatus(catalog: DataFrame, states: DataFrame): DataFrame =
    catalog.join(states.withColumnRenamed("status", "live_status"),
        catalog("dag_id") === states("pipeline"), "left_outer")
      .withColumn("status",
        coalesce(col("live_status"), col("status")))
      .drop("pipeline", "live_status")
}
