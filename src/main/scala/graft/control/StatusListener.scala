package graft.control

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, JobFailed, JobSucceeded}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-process pipeline status tracking via SparkListener — replaces the
  * reference's HTTP polling of Airflow dagRun state
  * (/root/reference/app/utils/airflow_client.py:19-31) with push-based
  * callbacks, eliminating both the N+1 poll loop and the stuck-state quirk
  * (SURVEY.md §2-A A12).
  *
  * Pipelines are identified by the Spark job group: run work under
  * `spark.sparkContext.setJobGroup(pipelineName, ...)` (the analog of the
  * reference's `conf={"uploaded_by": ...}` job tagging,
  * airflow_client.py:59-67).
  */
class StatusListener extends SparkListener {
  private val states = TrieMap.empty[String, String]

  private def groupOf(props: java.util.Properties): Option[String] =
    Option(props).flatMap(p => Option(p.getProperty("spark.jobGroup.id")))

  private val jobGroup = TrieMap.empty[Int, String]

  override def onJobStart(e: SparkListenerJobStart): Unit =
    groupOf(e.properties).foreach { g =>
      jobGroup.put(e.jobId, g)
      states.put(g, "running")
    }

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    jobGroup.remove(e.jobId).foreach { g =>
      e.jobResult match {
        case JobSucceeded => states.put(g, "success")
        case _: JobFailed => states.put(g, "failed")
        case _            => states.put(g, "failed")
      }
    }

  def status(pipeline: String): Option[String] = states.get(pipeline)

  /** Current states as DataFrame[pipeline, status] for catalog joins. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    states.toSeq.toDF("pipeline", "status")
  }
}

object StatusListener {
  /** Install a listener on the session; caller keeps the handle. */
  def install(spark: SparkSession): StatusListener = {
    val l = new StatusListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
