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

  test("Graft facade: pipelines listed, plan resolves, unknown rejects") {
    assert(Graft.pipelines.contains("q1_pricing_summary"))
    assert(Graft.plan(spark, "q1_pricing_summary",
      "/root/testdata/sf0.001").columns.contains("sum_qty"))
    intercept[control.PipelineRegistry.UnknownPipeline] {
      Graft.plan(spark, "nope", "/root/testdata/sf0.001")
    }
  }
}
