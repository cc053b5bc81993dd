package graft.queries

import java.sql.Timestamp
import graft.SparkTestBase

/** GSP level-2 containment semantics ([[EventQueries.seqpatFromSpans]])
  * and the incremental span-merge identity: supports from merged
  * partial spans must equal supports from the full log, for any split.
  */
class SeqpatSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)

  private def spansOf(ev: Seq[(Long, String, Timestamp)]) = {
    import org.apache.spark.sql.functions._
    ev.toDF("user_id", "event_type", "ts")
      .groupBy(col("user_id"), col("event_type").as("t"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
  }

  test("hand-traced containment: a-then-b via spans, strict order, " +
    "existential (any gap), both directions when history interleaves") {
    // u1: a@1, b@5, a@10  → contains a→b (1<5) AND b→a (5<10)
    // u2: b@2, a@8        → contains b→a only
    val ev = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(5)), (1L, "a", ts(10)),
      (2L, "b", ts(2)), (2L, "a", ts(8)))
    val got = EventQueries.seqpatFromSpans(spansOf(ev))
      .select("a", "b", "n_both", "n_seq")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L, 1L), ("b", "a", 2L, 2L)))
  }

  test("same-timestamp events are NOT ordered (strict <)") {
    val ev = Seq((1L, "a", ts(3)), (1L, "b", ts(3)))
    val got = EventQueries.seqpatFromSpans(spansOf(ev))
      .select("a", "b", "n_seq").as[(String, String, Long)]
      .collect().toSet
    assert(got == Set(("a", "b", 0L), ("b", "a", 0L)))
  }

  test("incremental span merge equals from-scratch supports for " +
    "random logs and random splits") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val types = Seq("a", "b", "c", "d")
      val ev = Seq.fill(120)((rnd.nextInt(9).toLong + 1,
        types(rnd.nextInt(types.length)), ts(rnd.nextInt(500))))
      val (oldE, newE) = ev.partition(_ => rnd.nextDouble() < 0.7)
      val full = EventQueries.seqpatFromSpans(spansOf(ev))
        .as[(String, String, Long, Long, Double)].collect().toSeq
      val merged = spansOf(oldE).unionByName(spansOf(newE))
        .groupBy(col("user_id"), col("t"))
        .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      val inc = EventQueries.seqpatFromSpans(merged)
        .as[(String, String, Long, Long, Double)].collect().toSeq
      assert(inc == full, s"trial $trial")
    }
  }
}
