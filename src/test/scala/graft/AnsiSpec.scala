package graft

/** ANSI-mode guard for the overflow/division classes round-4 ADVICE
  * flagged (BIGINT wrap in lift_ppm, div-by-zero in inclusion, …):
  * the arithmetic-heavy operators must run clean under
  * `spark.sql.ansi.enabled=true`, where silent wraps and x/0 become
  * runtime errors. A full-registry ANSI sweep (all 191 queries at
  * sf0.001) passed when this spec was added; this subset keeps the
  * regression guard cheap. ANSI is a runtime SQL conf, set on the
  * shared session and restored after (a fresh getOrCreate would
  * silently reuse the non-ANSI test session and guard nothing).
  */
class AnsiSpec extends SparkTestBase {

  private val picks = Seq(
    "q_assoc_rules",          // lift numerator (decimal-widened)
    "q_profile_inclusion",    // containment div (zero-guarded)
    "q_graph_pagerank_weighted", // (pr·w) product (decimal-widened)
    "q_stat_zscore",          // integer power sums
    "q_stat_ttest",           // variance from power sums
    "q_agg_quantile_sketch",  // integer rank arithmetic
    "q_profile_drift",        // integer bins + smoothing
    "q_graph_betweenness")    // σ products / σ_st division

  test("arithmetic-heavy operators run clean under ANSI mode") {
    // parameterless get: the EFFECTIVE value ("true" — ANSI is the
    // Spark 4 session default). get(key, fallback) returns the
    // fallback for never-explicitly-set confs and restoring that
    // fallback turned ANSI OFF for every later suite in the JVM.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try picks.foreach { name =>
      graft.ops.CacheScope.scoped {
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
