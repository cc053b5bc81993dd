package graft.tools

import graft.{Engine, SparkEntry}

/** Dev-only plan capture: writes `.explain("formatted")` for the named
  * registry queries to `<outDir>/<query><suffix>.txt` — the evidence
  * files under `plans/r16/` (optimization-round before/after captures).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query...>
  * (suffix is e.g. "_before" / "_after"; env knobs like
  * SPARK_GRAFT_REPART_MAX_MB apply as in any run.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, queries @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.local(cpus, "graft-plandump")
    new java.io.File(outDir).mkdirs()
    queries.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), plan)
      println(s"wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
