package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"
  private def mutate(s: String, i: Int): String =
    s.updated(math.min(i, s.length - 1), 'x')

  lazy val docs = Seq(
    (0L, base),                       // near-dup cluster {0,1,2}
    (1L, mutate(base, 5)),
    (2L, mutate(base, 20)),
    (3L, "completely different content about spark query engines at scale"),
    (4L, "yet another unrelated document mentioning minhash and lsh"),
    (5L, base)                        // exact dup of 0
  ).toDF("doc_id", "text")

  test("shingles: distinct character k-grams") {
    val sh = spark.range(1).select(
      Dedup.shingles(lit("abcab"), 3).as("s")).head().getSeq[String](0)
    assert(sh.toSet == Set("abc", "bca", "cab"))
    assert(sh.length == 3) // 'abc' appears twice, deduped
  }

  test("shingles: short text yields the whole string") {
    val sh = spark.range(1).select(
      Dedup.shingles(lit("ab"), 5).as("s")).head().getSeq[String](0)
    assert(sh == Seq("ab"))
  }

  test("exact jaccard finds the planted near-dup cluster and exact dup") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 5L)))  // exact dup → jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exact dup pair has jaccard exactly 1.0") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5)
      .filter($"id_a" === 0 && $"id_b" === 5)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("minhash-LSH recall: finds every exact-jaccard pair above 0.7") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 16 bands × 2 rows: the S-curve parameterization that SUPPORTS the
    // "every pair ≥ 0.7 collides" claim (p ≈ 1−(1−0.7²)¹⁶ ≈ 0.99995;
    // the registered query's 8×4 gives only ~0.87 at J = 0.706 — the
    // fixture's (1,2) pair — so asserting total recall there would pin
    // family luck, not the operator contract).
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 5, bands = 16, rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(lsh),
      s"missed: ${exact.diff(lsh)}") // high-sim pairs must collide
  }

  test("minhash-LSH recall at the registered 8x4 banding: planted dups ≥ 0.84 all found") {
    // at J ≥ 0.84 the 8×4 collision odds are ≥ 0.997 — the regime the
    // registered q_dedup_minhash parameters are designed for
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.84)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text",
      k = 5, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(lsh), s"missed: ${exact.diff(lsh)}")
  }

  test("banded jaccard: recall 1.0 vs exact on the fixture, values exact") {
    val exact = CacheScope.scoped {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.7)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    }
    val banded = CacheScope.scoped {
      Dedup.ngramJaccardPairsBanded(docs, "doc_id", "text", 5, 0.7,
          bands = 16, rowsPerBand = 2)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    }
    assert(exact.nonEmpty)
    // 16×2 banding at t=0.7 (explicit: the parameterization that
    // supports total recall down to 0.7 — the 8×4 default targets 0.8):
    // per-pair miss odds ≤ (1−0.49)¹⁶ ≈ 2e-5, and the family is FIXED,
    // so this equality is deterministic; verified jaccard values are
    // exact (same arithmetic as the exact operator), so surviving pairs
    // match bit-for-bit
    assert(banded == exact, s"missed: ${exact.diff(banded)}")
  }

  test("minhash est_jaccard is 1.0 for identical docs") {
    val est = Dedup.minhashPairs(docs, "doc_id", "text")
      .filter($"id_a" === 0 && $"id_b" === 5)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("minhashPairsIncremental: batch vs corpus only — corpus never self-pairs") {
    // corpus holds a near-dup pair {0,1}; the batch brings 10 (dup of 0)
    // and 11/12 (dups of each other), 13 (unrelated)
    val corpus = Seq((0L, base), (1L, mutate(base, 5)),
      (3L, "completely different content about spark query engines at scale"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, mutate(base, 20)),
      (12L, mutate(base, 20)),
      (13L, "nothing like anything else in this tiny test fixture at all"))
      .toDF("doc_id", "text")
    val pairs = CacheScope.scoped {
      Dedup.minhashPairsIncremental(corpus, batch, "doc_id", "text",
          threshold = 0.7)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    }
    // every pair touches the batch; the corpus-internal near-dup (0,1)
    // must NOT appear
    assert(pairs.forall { case (a, b) => b >= 10L })
    assert(!pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 10L)), pairs)  // corpus × batch
    assert(pairs.contains((11L, 12L)), pairs) // batch × batch, a < b
    assert(!pairs.exists { case (a, b) => a == 13L || b == 13L })
  }

  test("dedupComponents: chains merge transitively, disjoint stay apart") {
    // components: {1,2,3,4} via chain 1-2-3-4 (similarity is NOT
    // transitive — only CC recovers the full cluster), {10,11}, and a
    // cycle {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val comp = CacheScope.scoped {
      Dedup.dedupComponents(pairs, iters = 8)
        .as[(Long, Long)].collect().toMap
    }
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
    assert(comp.size == 9)
  }

  test("dedupComponentsAuto: driver union-find tier equals the " +
    "distributed path on random pair graphs; probe bound forces the " +
    "fallthrough") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(60)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2).toDF("id_a", "id_b")
      val (fast, slow) = CacheScope.scoped {
        (Dedup.dedupComponentsAuto(pairs)
          .as[(Long, Long)].collect().toMap,
          Dedup.dedupComponentsAuto(pairs, smallLimit = 0L)
            .as[(Long, Long)].collect().toMap)
      }
      assert(fast == slow, s"trial $trial")
      // canonical label = min member id (both tiers)
      val byComp = fast.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
      assert(byComp.forall { case (c, mn) => c == mn }, s"trial $trial")
    }
  }

  test("dedupComponents: pointer doubling covers a 20-node chain in " +
    "4 rounds (linear propagation would need 19)") {
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = CacheScope.scoped {
      Dedup.dedupComponents(pairs, iters = 4) // reach 2^5-2 = 30 ≥ 19
        .as[(Long, Long)].collect().toMap
    }
    assert(comp.size == 20)
    assert(comp.values.forall(_ == 0L))
  }

  test("dedupComponentsConverged stops early: 2 components, not maxIters") {
    // two shallow components: diameter 2 ⇒ labels settle in round 1
    // (pointer doubling reaches ≥2 hops); round 2 is the unchanged-
    // checksum detection round — so 2 rounds total, far below the
    // 8-round blind bound
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val (df, rounds) = CacheScope.scoped {
      val (d, r) = Dedup.dedupComponentsConverged(pairs, maxIters = 8)
      (d.as[(Long, Long)].collect().toMap, r)
    }
    assert(rounds == 2, s"expected convergence in 2 rounds, ran $rounds")
    assert(Seq(1L, 2L, 3L).forall(df(_) == 1L))
    assert(Seq(10L, 11L).forall(df(_) == 10L))
    // identical result to the fixed-iteration form
    val fixed = CacheScope.scoped {
      Dedup.dedupComponents(pairs, iters = 8)
        .as[(Long, Long)].collect().toMap
    }
    assert(df == fixed)
  }

  test("dedupComponentsConverged: deep chain uses more rounds, same labels") {
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (df, rounds) = CacheScope.scoped {
      val (d, r) = Dedup.dedupComponentsConverged(pairs, maxIters = 16)
      (d.as[(Long, Long)].collect().toMap, r)
    }
    // 20-node chain: reach after k rounds ≥ 2^(k+1)−2 ⇒ settled by
    // round 4; +1 detection round, and strictly fewer than maxIters
    assert(rounds >= 4 && rounds <= 6, s"rounds=$rounds")
    assert(df.size == 20 && df.values.forall(_ == 0L))
  }

  test("simhash: identical docs hash identically, unrelated docs differ") {
    val h = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(5L))
    assert(h(0L) != h(3L))
    // near-dups are close in hamming distance
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(1L)) <= 12,
      s"hamming=${hamming(h(0L), h(1L))}")
    assert(hamming(h(0L), h(3L)) > 12)
  }

  test("exactGroups: canonical min-id representative") {
    val g = Dedup.exactGroups(docs, $"text", $"doc_id")
      .filter($"n_copies" > 1)
      .select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((0L, 2L)))
  }

  test("embeddingExactPairs matches the naive all-pairs join bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 80).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // the quadratic BNL form, kept ONLY as this small-scale cross-check
    val a = vecs.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = vecs.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val naive = a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b", expr("cosine_sim(va, vb)").as("cosine"))
      .filter($"cosine" >= 0.2)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Dedup.embeddingExactPairs(vecs, "vec_id", "embedding",
        minCosine = 0.2, blocks = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty)
    assert(blocked == naive)
  }

  test("embeddingExactPairs covers every pair exactly once (no block dups)") {
    graft.functions.GraftFunctions.register(spark)
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    // identical vectors: every unordered pair has cosine 1.0 — count must
    // be exactly C(30,2), proving no pair is emitted twice or dropped
    val n = Dedup.embeddingExactPairs(vecs, "vec_id", "embedding",
      minCosine = 0.99, blocks = 4).count()
    assert(n == 30L * 29 / 2)
  }

  test("embeddingNearDups finds planted duplicate vectors via LSH buckets") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.5f, -0.2f, 0.8f)),
      (1L, Array(1.0f, 0.5f, -0.2f, 0.8f)),     // exact dup of 0
      (2L, Array(1.01f, 0.49f, -0.21f, 0.79f)), // near dup of 0
      (3L, Array(-1.0f, 0.4f, 0.9f, -0.7f))     // unrelated
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      nBits = 8, seed = 7, minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }
}
