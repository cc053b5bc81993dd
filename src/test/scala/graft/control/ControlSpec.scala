package graft.control

import java.sql.Timestamp
import graft.SparkTestBase

class ControlSpec extends SparkTestBase {
  import spark.implicits._

  private val now = Timestamp.valueOf("2026-01-01 00:00:00")

  test("register: reference status semantics (uploaded vs processing)") {
    val d = Catalog.register(spark, 1L, "data.csv", None, now)
    assert(d.status == "uploaded" && d.file_type == "csv" && d.dag_id.isEmpty)
    val p = Catalog.register(spark, 1L, "job.py", Some("q1_pricing_summary"), now)
    assert(p.status == "processing" && p.dag_id.contains("q1_pricing_summary"))
    val u = Catalog.register(spark, 1L, "mystery", None, now)
    assert(u.file_type == "unknown")
  }

  test("forUser: per-tenant catalog scan (A6)") {
    val cat = Seq(
      Catalog.register(spark, 1L, "a.csv", None, now),
      Catalog.register(spark, 2L, "b.csv", None, now)).toDF()
    assert(Catalog.forUser(cat, 1L).count() == 1)
  }

  test("withLiveStatus: listener state overrides, stale rows keep status") {
    val cat = Seq(
      Catalog.register(spark, 1L, "a.py", Some("p1"), now),
      Catalog.register(spark, 1L, "b.py", Some("p2"), now)).toDF()
    val live = Seq(("p1", "success")).toDF("pipeline", "status")
    val out = Catalog.withLiveStatus(cat, live)
      .select("dag_id", "status").as[(String, String)].collect().toMap
    assert(out("p1") == "success")
    assert(out("p2") == "processing")
  }

  test("PipelineRegistry: unknown name raises (extract_dag_id → None analog)") {
    intercept[PipelineRegistry.UnknownPipeline] {
      PipelineRegistry.resolve("no_such_pipeline")
    }
    assert(PipelineRegistry.resolve("q1_pricing_summary") != null)
  }

  test("StatusListener: job-group success and failure transitions") {
    val l = StatusListener.install(spark)
    spark.sparkContext.setJobGroup("ok_pipe", "ok", true)
    spark.range(100).count()
    spark.sparkContext.clearJobGroup()
    spark.sparkContext.setJobGroup("bad_pipe", "bad", true)
    intercept[Exception] {
      spark.range(10).map(i => (1 / (i - i)).toString).count() // div by zero
    }
    spark.sparkContext.clearJobGroup()
    // listener callbacks are async; wait for the bus to drain
    var tries = 0
    while ((l.status("ok_pipe") != Some("success") ||
            l.status("bad_pipe") != Some("failed")) && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    assert(l.status("ok_pipe") == Some("success"))
    assert(l.status("bad_pipe") == Some("failed"))
    assert(l.snapshot(spark).count() >= 2)
  }

  test("submit: resolves, runs under job group, writes parquet result") {
    val out = Files.createTempDir()
    PipelineRegistry.submit(spark, "q_join_cross",
      "/root/testdata/sf0.001", out)
    assert(spark.read.parquet(s"$out/q_join_cross").count() > 0)
  }

  private object Files {
    def createTempDir(): String =
      java.nio.file.Files.createTempDirectory("graft-submit").toString
  }
}
