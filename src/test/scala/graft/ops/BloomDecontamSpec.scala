package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom-prefiltered decontamination (Decontaminate.bloomFunnel):
  * the probe can only over-approximate — false positives cost
  * verification work, false negatives are impossible — so the verified
  * contaminated set must equal the exact rule at ANY filter size,
  * including a deliberately saturated 64-bit filter where nearly every
  * gram is a candidate. Complements q_curate_decontam_bloom's DuckDB
  * funnel oracle with adversarial-geometry assertions.
  */
class BloomDecontamSpec extends SparkTestBase {
  import spark.implicits._

  // 4-token docs, 2-gram rule: doc 1 shares "swapped the flux" context
  // with the bench doc; docs 2-3 share nothing
  private val docs = Seq(
    (0L, "alpha beta gamma delta"),            // the benchmark doc
    (1L, "omega alpha beta epsilon"),          // shares gram "alpha beta"
    (2L, "one two three four"),
    (3L, "five six seven eight")
  ).toDF("doc_id", "text")
  private val bench = docs.filter(col("doc_id") === 0)

  private def funnel(m: Int, k: Int): Map[String, Long] = {
    val r = Decontaminate.bloomFunnel(docs, "doc_id", "text",
      bench, "text", n = 2, m = m, k = k).collect()(0)
    r.schema.fieldNames.map(f => f -> r.getAs[Long](f)).toMap
  }

  test("well-sized filter: candidates may exceed true matches but the " +
      "verified set is exact") {
    val f = funnel(m = 4096, k = 3)
    assert(f("n_bench_grams") == 3L)        // 3 bigrams of 4 tokens
    assert(f("n_corpus_grams") == 12L)
    // docs 0 and 1 contain true matching grams; FPs can only add
    assert(f("n_candidate_grams") >= 4L)
    assert(f("n_contaminated_docs") == 2L)  // doc 0 matches itself
    assert(f("n_kept_docs") == 2L)
  }

  test("saturated 64-bit filter: FP-heavy candidates, identical " +
      "verified output (no false negatives by construction)") {
    val f = funnel(m = 64, k = 3)
    // 9 probe positions over 64 bits: most grams collide into
    // candidacy, yet verification restores the exact rule
    assert(f("n_candidate_grams") >= 4L)
    assert(f("n_candidate_docs") >= f("n_contaminated_docs"))
    assert(f("n_contaminated_docs") == 2L)
    assert(f("n_kept_docs") == 2L)
    assert(f("n_set_bits") <= 9L)
  }

  test("funnel counts agree with the exact pass across filter sizes") {
    val exact = Decontaminate.contaminatedIds(docs, "doc_id", "text",
      bench, "text", n = 2).as[Long].collect().toSet
    assert(exact == Set(0L, 1L))
    for (m <- Seq(64, 1024, 32768)) {
      val f = funnel(m, k = 3)
      assert(f("n_contaminated_docs") == exact.size.toLong,
        s"m=$m funnel=$f")
      assert(f("n_kept_docs") == 4L - exact.size.toLong)
    }
  }
}
