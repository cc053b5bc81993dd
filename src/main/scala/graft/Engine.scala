package graft

import org.apache.spark.sql.SparkSession

/** Session factory — the library's one place for engine configuration.
  *
  * Local (evaluation) defaults mirror what a tuned cluster submit would
  * set, scaled down:
  *  - AQE on, with skew-join splitting and partition coalescing — the
  *    runtime re-planner that fixes stats misestimates at 100 TB.
  *  - `spark.sql.shuffle.partitions` sized to the core count locally;
  *    on a cluster start from ~2–3× total executor cores and let AQE
  *    coalesce down (each post-coalesce task should hold ~128–256 MB).
  *  - Session timezone pinned UTC — timestamp arithmetic must not
  *    depend on host configuration (and the DuckDB oracle agrees).
  *
  * Cluster-only knobs intentionally NOT set here (site-specific, listed
  * for the submit script): executor memory/cores, shuffle service,
  * `spark.sql.files.maxPartitionBytes` (default 128 MB is right),
  * broadcast threshold (default 10 MB; raise only with measured
  * dimension sizes), reliable checkpoint dir for iterative/streaming
  * state.
  */
object Engine {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session with WARN logging — Verify/Bench/dev entry point. */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
