package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine

/** Dev-only micro-probe: isolate the CPU cost of a round-robin
  * repartition above a small single-row-group parquet scan. */
object ProbeRepart {
  private def cpuNs: Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.local(32, "probe-repart")
    import spark.implicits._
    def time(label: String)(body: => Unit): Unit = {
      // warm once, then 3 reps
      body
      val reps = 3
      val t0 = System.nanoTime(); val c0 = cpuNs
      (1 to reps).foreach(_ => body)
      val w = (System.nanoTime() - t0) / 1e9 / reps
      val c = (cpuNs - c0) / 1e9 / reps
      println(f"[probe] $label%-44s wall=$w%6.3fs cpu=$c%7.3fs")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("lineitem agg, raw") {
      li.agg(sum($"l_partkey")).collect(): Unit
    }
    time("lineitem agg, repartition(32)") {
      li.repartition(32).agg(sum($"l_partkey")).collect(): Unit
    }
    time("lineitem wide noop, raw") {
      li.write.format("noop").mode("overwrite").save()
    }
    time("lineitem wide noop, repartition(32)") {
      li.repartition(32).write.format("noop").mode("overwrite").save()
    }
    time("docs shingle count, raw") {
      docs.select(explode(expr(
        "transform(sequence(1, greatest(length(text)-4, 0))," +
          " i -> substring(text, i, 5))")).as("s"))
        .groupBy($"s").agg(count(lit(1))).agg(sum("count(1)"))
        .collect(): Unit
    }
    time("docs shingle count, repartition(32)") {
      docs.repartition(32).select(explode(expr(
        "transform(sequence(1, greatest(length(text)-4, 0))," +
          " i -> substring(text, i, 5))")).as("s"))
        .groupBy($"s").agg(count(lit(1))).agg(sum("count(1)"))
        .collect(): Unit
    }
    spark.stop()
  }
}
