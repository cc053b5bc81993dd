package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine

/** Dev-only probe: decompose q_graph_pagerank-style cost into edge
  * build vs iteration rounds. */
object ProbeGraph {
  private def cpuNs: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.local(32, "probe-graph")
    import spark.implicits._
    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime(); val c0 = cpuNs
      body
      println(f"[probe] $label%-40s wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"cpu=${(cpuNs - c0) / 1e9}%7.2fs")
    }
    def edges = Tables_shipmentEdges(spark, dir)
    time("edge build (join+select) noop") {
      edges.write.format("noop").mode("overwrite").save()
    }
    time("edges.distinct noop") {
      edges.distinct().write.format("noop").mode("overwrite").save()
    }
    // stage-level decomposition of one cold pagerank run
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val info = sc.stageInfo
        val key = s"${info.stageId}%: ${info.name.take(90)}"
        stageCpu.put(key, info.taskMetrics.executorCpuTime / 1000000L)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    graft.ops.CacheScope.scoped {
      graft.ops.Graph.pagerank(edges, iters = 1)
        .write.format("noop").mode("overwrite").save()
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    stageCpu.asScala.toSeq.sortBy(-_._2).take(15).foreach {
      case (k, ms) => println(f"[stage] ${ms}%6dms cpu  $k")
    }
    time("pagerank iters=1") {
      graft.ops.CacheScope.scoped {
        graft.ops.Graph.pagerank(edges, iters = 1)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("pagerank iters=3 (the query)") {
      graft.ops.CacheScope.scoped {
        graft.ops.Graph.pagerank(edges, iters = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("full q_graph_pagerank (with orderBy)") {
      graft.ops.CacheScope.scoped {
        graft.queries.GraphQueries.defs("q_graph_pagerank")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }

  private def Tables_shipmentEdges(
      spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    graft.io.Tables.lineitem(spark, dir)
      .join(graft.io.Tables.orders(spark, dir),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("src"), ($"o_custkey" + 1000000L).as("dst"))
  }
}
