package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOf, Dedup, TextAnalysis}

/** Degenerate-input robustness: empty frames, empty/whitespace strings,
  * single rows — the inputs an ETL service actually receives.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup ops on empty input return empty, not errors") {
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 5, 0.8)
      .count() == 0)
    assert(Dedup.minhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("as-of join with empty right side keeps all left rows, null payload") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "t")
    val r = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("k", "t", "price")
    val out = AsOf.asOfJoin(l, r, "k", "k", "t", "t", Seq("price"))
    assert(out.count() == 1)
    assert(out.select("price").head().isNullAt(0))
  }

  test("text ops on empty and whitespace-only strings") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("id", "text")
    val out = df.select($"id",
        TextAnalysis.tokenCount($"text").as("n"),
        TextAnalysis.langGuess($"text").as("lang"),
        TextAnalysis.fingerprintMd5($"text").as("fp"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getString(2))).toMap
    assert(out(1L) == ((0, "und")))
    assert(out(2L) == ((0, "und")))
    assert(out(3L) == ((1, "und")))
  }

  test("shingles of empty string do not crash") {
    val sh = spark.range(1)
      .select(Dedup.shingles(lit(""), 5).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq(""))
  }

  test("single-document corpus produces no pairs") {
    val one = Seq((1L, "only document here")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(one, "doc_id", "text", 5, 0.5)
      .count() == 0)
  }

  test("bm25: absent query term contributes nothing; empty corpus OK") {
    val docs = Seq((1L, "cat dog"), (2L, "dog mouse")).toDF("id", "text")
    val withAbsent = ops.TextAnalysis.bm25(docs, "id", "text",
      Seq("cat", "zzzz")).collect().map(r => r.getLong(0)).toSet
    assert(withAbsent == Set(1L)) // only the cat doc matches anything
    val empty = ops.TextAnalysis.bm25(docs.limit(0), "id", "text",
      Seq("cat"))
    assert(empty.count() == 0)
  }

  test("chunk of empty text yields one empty chunk, not zero rows") {
    val out = ops.TextAnalysis.chunk(
        Seq((1L, "")).toDF("id", "text"), "id", "text", 10, 2)
      .collect()
    assert(out.length == 1 && out.head.getString(2) == "")
  }

  test("quantizeInt8 and keySkew on empty inputs return empty") {
    val e = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(ops.Similarity.quantizeInt8(e, "vec_id", "embedding")
      .count() == 0)
    val k = Seq.empty[(Long, String)].toDF("id", "dom")
    assert(ops.CacheScope.scoped {
      ops.Profile.keySkew(k, "dom").count()
    } == 0)
  }

  test("merge upsert where base is empty: all updates are inserts") {
    val base = Seq.empty[(Long, String)].toDF("k", "v")
    val upd = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val out = ops.Merge.upsert(base, upd, "k")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b"))
  }

  test("remixToTarget with no matching domains returns empty") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "dom")
    assert(ops.Sampling.remixToTarget(df, "id", "dom",
      Seq("zz" -> 1.0)).count() == 0)
  }

  test("round-4 ops on empty inputs return empty, not errors") {
    val e2 = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ops.Graph.labelPropagation(e2, 2).count() == 0)
    assert(ops.Graph.pagerank(e2, 1).count() == 0)
    assert(ops.Graph.pagerankWeighted(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight"),
      1).count() == 0)
    val pts = Seq.empty[(Long, Double, Int)].toDF("id", "x", "y")
    assert(ops.Mining.skyline2D(pts, "x", "y").count() == 0)
    assert(ops.Mining.assocPairs(
      Seq.empty[(Long, String)].toDF("b", "i"), "b", "i").count() == 0)
    assert(ops.Merge.cdcApply(
      Seq.empty[(Long, Long, String, String)].toDF("k", "seq", "op", "v"),
      "k", "seq", "op").count() == 0)
  }

  test("quality audit on an empty table: every check passes vacuously") {
    val df = Seq.empty[(Long, Option[String])].toDF("id", "name")
    val out = ops.Quality.audit(df, Seq(
      ops.Quality.Complete("c", "name"),
      ops.Quality.Unique("u", Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out == Map("c" -> true, "u" -> true))
  }

  test("fourth-session queries on EMPTY fixtures return empty, " +
    "not errors") {
    val dir = java.nio.file.Files.createTempDirectory("edge8").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    import graft.queries._
    assert(StatsQueries.qStatKs(spark, dir).count() == 0)
    assert(StatsQueries.qStatBootstrap(spark, dir).count() == 0)
    assert(StatsQueries.qStatPsi(spark, dir).count() == 0)
    assert(StreamQueries.qTimeCusum(spark, dir).count() == 0)
    assert(StreamQueries.qTimeTheilsen(spark, dir).count() == 0)
    assert(StreamQueries.qTimeSeasonal(spark, dir).count() == 0)
    assert(EventQueries.qEventRfm(spark, dir).count() == 0)
    assert(EventQueries.qEventAttribution(spark, dir).count() == 0)
    assert(AggQueries.qAggBitmapRollup(spark, dir).count() == 0)
    assert(TextQueries.qTextCdcDedup(spark, dir).count() == 0)
    assert(TextQueries.qTextWordpiece(spark, dir).count() == 0)
    assert(CurationQueries.qCurateShard(spark, dir).count() == 0)
  }

  test("Graft facade: pipelines listed, plan resolves, unknown rejects") {
    assert(Graft.pipelines.contains("q1_pricing_summary"))
    assert(Graft.plan(spark, "q1_pricing_summary",
      "/root/testdata/sf0.001").columns.contains("sum_qty"))
    intercept[control.PipelineRegistry.UnknownPipeline] {
      Graft.plan(spark, "nope", "/root/testdata/sf0.001")
    }
  }
}
