package graft

import graft.queries._

/** Registry-integrity guards (VERDICT r2 item 6): `SparkEntry.queries`
  * merges the per-file maps with `++`, where a duplicated key would
  * silently shadow an earlier definition — and an oracle key without a
  * query would silently never be checked. Cheap insurance that fails
  * loudly instead.
  */
class RegistrySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val parts: Seq[(String, Map[String, _])] = Seq(
    "AggQueries" -> AggQueries.defs,
    "JoinQueries" -> JoinQueries.defs,
    "SetOpQueries" -> SetOpQueries.defs,
    "WindowQueries" -> WindowQueries.defs,
    "FuncQueries" -> FuncQueries.defs,
    "DedupQueries" -> DedupQueries.defs,
    "SimilarityQueries" -> SimilarityQueries.defs,
    "TextQueries" -> TextQueries.defs,
    "MiscQueries" -> MiscQueries.defs,
    "StreamQueries" -> StreamQueries.defs,
    "CustomQueries" -> CustomQueries.defs,
    "SqlQueries" -> SqlQueries.defs,
    "FilterQueries" -> FilterQueries.defs,
    "TpchQueries" -> TpchQueries.defs,
    "CurationQueries" -> CurationQueries.defs,
    "StatsQueries" -> StatsQueries.defs,
    "GraphQueries" -> GraphQueries.defs,
    "QualityQueries" -> QualityQueries.defs,
    "MiningQueries" -> MiningQueries.defs,
    "EventQueries" -> EventQueries.defs)

  private val oracleParts: Seq[(String, Map[String, String])] = Seq(
    "AggQueries" -> AggQueries.oracles,
    "JoinQueries" -> JoinQueries.oracles,
    "SetOpQueries" -> SetOpQueries.oracles,
    "WindowQueries" -> WindowQueries.oracles,
    "FuncQueries" -> FuncQueries.oracles,
    "DedupQueries" -> DedupQueries.oracles,
    "SimilarityQueries" -> SimilarityQueries.oracles,
    "TextQueries" -> TextQueries.oracles,
    "MiscQueries" -> MiscQueries.oracles,
    "StreamQueries" -> StreamQueries.oracles,
    "CustomQueries" -> CustomQueries.oracles,
    "SqlQueries" -> SqlQueries.oracles,
    "FilterQueries" -> FilterQueries.oracles,
    "TpchQueries" -> TpchQueries.oracles,
    "CurationQueries" -> CurationQueries.oracles,
    "StatsQueries" -> StatsQueries.oracles,
    "GraphQueries" -> GraphQueries.oracles,
    "QualityQueries" -> QualityQueries.oracles,
    "MiningQueries" -> MiningQueries.oracles,
    "EventQueries" -> EventQueries.oracles)

  test("query keys are disjoint across files — nothing shadows in the ++ merge") {
    val dupes = parts.flatMap { case (src, m) => m.keys.map(_ -> src) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, srcs) => s"$k in ${srcs.map(_._2).mkString(", ")}" }
    assert(dupes.isEmpty, s"duplicated query keys: ${dupes.mkString("; ")}")
    assert(SparkEntry.queries.size == parts.map(_._2.size).sum)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("oracle keys are disjoint across files") {
    val dupes = oracleParts.flatMap { case (src, m) => m.keys.map(_ -> src) }
      .groupBy(_._1).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicated oracle keys: ${dupes.mkString(", ")}")
  }

  test("every registry query appears LITERALLY in COVERAGE.md — the " +
    "doc-sync claim that drifted in r12/r13, now mechanical") {
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val covNames = "q[a-z0-9_]+".r.findAllIn(cov).toSet
    val absent = SparkEntry.queries.keySet.diff(covNames)
    assert(absent.isEmpty,
      s"registry queries missing a COVERAGE.md row: ${absent.toSeq.sorted}")
  }

  test("every registry query has a PLANS.md plan capture OR an explicit " +
    "exemption line — the same drift class as COVERAGE.md, mechanized " +
    "after r14 shipped four pick-less queries") {
    val plans = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    val sections = "(?m)^## (q[a-z0-9_]+)".r
      .findAllMatchIn(plans).map(_.group(1)).toSet
    val exempt = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/plans_exempt.txt"), "UTF-8")
      .getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    val absent = SparkEntry.queries.keySet -- sections -- exempt
    assert(absent.isEmpty,
      "registry queries with neither a PLANS.md capture nor a " +
        s"plans_exempt.txt line: ${absent.toSeq.sorted}")
    // keep both lists from rotting: an exempt line must name a live
    // query and must not ALSO have a capture (then the line is noise)
    val dead = exempt -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"plans_exempt.txt lines naming no registry " +
      s"query: ${dead.toSeq.sorted}")
    val both = exempt.intersect(sections)
    assert(both.isEmpty, s"plans_exempt.txt lines that already have a " +
      s"PLANS.md capture: ${both.toSeq.sorted}")
  }

  test("oracle SQL strings are nonempty and reference no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      // cheap sanity: a DuckDB oracle never calls Spark-registered UDFs
      assert(!sql.contains("cosine_sim("), s"$k: Spark-only function in oracle")
      assert(!sql.contains("bitmap_and_count("), s"$k: Spark-only function in oracle")
    }
  }
}
