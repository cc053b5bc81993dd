package graft

import org.scalatest.funsuite.AnyFunSuite

/** Committed-bench-history guard (VERDICT r12 #2): `bench_detail.json`
  * is load-bearing — `Bench.loadHistory` arms the per-query outlier
  * retry machinery from it, and a targeted dev run that overwrites it
  * with a handful of queries silently DISARMS retries for the whole
  * fleet in the next official round run ("no history ⇒ never
  * suspect"). Bench now routes targeted runs to
  * `bench_detail_partial.json`, and this spec fails the suite loudly
  * if the history in the repo ever stops covering the registry or
  * stops being a full-width (localThreads = 32) capture — so a
  * partial artifact can never ride a green `sbt test` into a commit.
  *
  * No Spark session needed: this is a pure file/registry check.
  */
class BenchHistorySpec extends AnyFunSuite {

  private def detail: String = {
    val p = java.nio.file.Paths.get("bench_detail.json")
    assert(java.nio.file.Files.exists(p),
      "bench_detail.json missing from the repo root — the retry " +
        "machinery has no history to arm from")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("bench_detail.json covers >= 95% of the query registry") {
    // same shallow scan as Bench.loadHistory — the consumer this
    // guard protects
    val obj = """"queries":\{([^}]*)\}""".r
      .findFirstMatchIn(detail).map(_.group(1)).getOrElse("")
    val keys = """"(q[A-Za-z0-9_]+)":""".r
      .findAllMatchIn(obj).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    val covered = registry.intersect(keys)
    val pct = covered.size.toDouble / math.max(registry.size, 1)
    assert(pct >= 0.95,
      f"committed bench history covers ${covered.size}/${registry.size} " +
        f"(${pct * 100}%.1f%%) of the registry — a targeted run " +
        "clobbered it; re-run the full fleet at SPARK_GRAFT_CPUS=32 " +
        "and commit bench_detail.json")
  }

  test("bench_detail.json is a full-width capture (localThreads = 32)") {
    val lt = """"localThreads":(\d+)""".r
      .findFirstMatchIn(detail).map(_.group(1).toInt)
    assert(lt.contains(32),
      s"committed bench history localThreads=$lt — history timings " +
        "must come from the official 32-thread configuration or the " +
        "5x outlier trigger misfires")
  }
}
