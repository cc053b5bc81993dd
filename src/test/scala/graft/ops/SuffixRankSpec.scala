package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins [[SuffixRank]] against a brute-force oracle on synthetic
  * planted overlaps, against the hashed-gram global pass on the same
  * input, and for partitioning invariance of the two-pass dense rank.
  */
class SuffixRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force ExactSubstr spans: HashMap over every L-char window,
    * first (doc_id, pos) survives, later positions merge to islands. */
  private def bruteSpans(docs: Seq[(Long, String)], L: Int)
      : Set[(Long, Long, Long)] = {
    val first = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((id, t) <- docs.sortBy(_._1); p <- 1 to t.length - L + 1) {
      val w = t.substring(p - 1, p - 1 + L)
      if (!first.contains(w)) first(w) = (id, p.toLong)
    }
    val dup = for {
      (id, t) <- docs
      p <- 1 to t.length - L + 1
      if first(t.substring(p - 1, p - 1 + L)) != ((id, p.toLong))
    } yield (id, p.toLong)
    dup.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val islands = sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      islands.map { case (s, e) => (id, s, e - s + L) }
    }.toSet
  }

  private val rng = new scala.util.Random(42)
  private def randText(n: Int): String =
    (1 to n).map(_ => ('a' + rng.nextInt(6)).toChar).mkString

  test("planted overlaps match brute force exactly") {
    // random base docs + planted shared substrings of 20..45 chars,
    // including an intra-doc repeat and a three-way share
    val shared1 = randText(25)
    val shared2 = randText(45)
    val shared3 = randText(20)
    val docs = Seq(
      (0L, randText(80) + shared1 + randText(30)),
      (1L, shared1 + randText(60)),
      (2L, randText(40) + shared2),
      (3L, shared2.substring(5) + randText(50) + shared3),
      (4L, shared3 + randText(10) + shared3),       // intra-doc repeat
      (5L, randText(15) + shared3 + randText(70)),  // three-way share
      (6L, randText(90)),                           // clean doc
      (7L, ""))                                     // empty doc
    val got = SuffixRank
      .duplicatedSpans(docs.toDF("doc_id", "text"), l0 = 5, doublings = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSpans(docs, 20))
    assert(got.exists(_._1 == 4L)) // the intra-doc repeat is caught
    assert(!got.exists(_._1 == 6L))
  }

  test("random corpus matches brute force (no planted structure)") {
    // small alphabet + short docs force accidental 20-char repeats
    // to be rare but possible; the sets must still agree exactly
    val docs = (0L until 40L).map { i =>
      (i, randText(60 + rng.nextInt(60)))
    }
    val got = SuffixRank
      .duplicatedSpans(docs.toDF("doc_id", "text"), l0 = 5, doublings = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSpans(docs, 20))
  }

  test("agrees with the hashed-gram global pass per doc") {
    // same semantics, different machinery: per-doc total duplicated
    // chars from suffix-rank spans == globalScrub's chars_removed
    val shared = randText(30)
    val docs = Seq(
      (0L, randText(50) + shared),
      (1L, shared + randText(40)),
      (2L, randText(70)),
      (3L, randText(20) + shared + randText(5)))
      .toDF("doc_id", "text")
    val viaRank = SuffixRank.duplicatedSpans(docs, 5, 2)
      .groupBy("doc_id").agg(sum("span_len").as("dup_chars"))
      .as[(Long, Long)].collect().toMap
    val viaHash = graft.queries.TextQueries.globalScrub(docs, 20)
      .select(col("doc_id"), col("chars_removed"))
      .as[(Long, Long)].collect().toMap
    assert(viaRank == viaHash)
  }

  test("direct window path == doubling rank path (both tiers exact)") {
    // the dispatcher picks direct grouping at L=20; this pins the two
    // physical plans to identical duplicated-position sets on planted
    // overlaps (incl. intra-doc repeat + empty doc) and random text
    val shared = randText(26)
    val docs = ((0L until 30L).map(i => (i, randText(50 + rng.nextInt(40))))
      ++ Seq((90L, randText(10) + shared + randText(15)),
        (91L, shared + randText(30)),
        (92L, shared.take(20) + randText(5) + shared.take(20)),
        (93L, ""))).toDF("doc_id", "text")
    val direct = SuffixRank.dupPositionsDirect(docs, 20L)
      .as[(Long, Long)].collect().toSet
    val doubling = SuffixRank.dupPositionsDoubling(docs, 5, 2)
      .as[(Long, Long)].collect().toSet
    assert(direct == doubling)
    assert(direct.exists(_._1 == 92L)) // intra-doc repeat caught by both
  }

  test("denseRank is partitioning-invariant and matches a global sort") {
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 97).toLong))
      .toDF("id", "k")
    def ranksOf(parts: Int) =
      Prefix.denseRank(df.repartition(parts), Seq(col("k")), "r")
        .select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val expect = df.select(col("id"),
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"))).cast("long").as("r"))
      .as[(Long, Long)].collect().toMap
    assert(ranksOf(1) == expect)
    assert(ranksOf(7) == expect)
  }

  test("rank ties are exact 20-char equality (truncation included)") {
    // two suffixes that agree on 19 chars then one ends: no tie; two
    // identical 20-char windows in different docs: tie → span of
    // EXACTLY 20 (tails use disjoint alphabets so no extension)
    val a = randText(19)
    val tail1 = (1 to 30).map(_ => ('g' + rng.nextInt(3)).toChar).mkString
    val tail2 = (1 to 25).map(_ => ('m' + rng.nextInt(3)).toChar).mkString
    val docs = Seq(
      (0L, a),                  // doc IS the 19-char prefix
      (1L, a + "z" + tail1),
      (2L, a + "z" + tail2)     // shares exactly 20 chars with doc 1
    ).toDF("doc_id", "text")
    val spans = SuffixRank.duplicatedSpans(docs, 5, 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((2L, 1L, 20L)))
  }
}
