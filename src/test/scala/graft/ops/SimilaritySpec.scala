package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: hand-computed values") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
        (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
        (Array(1.0f, 0.0f), Array(-1.0f, 0.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b").as("c"))
    val cs = df.as[Double].collect()
    assert(math.abs(cs(0) - 0.0) < 1e-12)
    assert(math.abs(cs(1) - 1.0) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK: exact ranking on constructed vectors") {
    // corpus engineered so neighbor order for query 0 is 3, 2, 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),     // cos 0.0
      (2L, Array(1.0f, 1.0f)),     // cos ~0.707
      (3L, Array(2.0f, 0.1f))      // cos ~0.9988
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
        vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().sorted
    assert(out.toSeq == Seq((1, 3L), (2, 2L), (3, 1L)))
  }

  test("lshTopK recall vs brute force on clustered vectors") {
    // 3 tight clusters of 20 vectors each in 8-dim space
    val rnd = new scala.util.Random(42)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 5,
        nBits = 4, nTables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("multiprobe raises lshTopK recall at no corpus-side fan-out") {
    val rnd = new scala.util.Random(99)
    val centers = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 80).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(multiprobe: Boolean): Double = {
      val got = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 5,
          nBits = 8, nTables = 2, multiprobe = multiprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val plain = recall(multiprobe = false)
    val probed = recall(multiprobe = true)
    assert(probed >= plain, s"probed=$probed plain=$plain")
    assert(probed >= 0.9, s"probed=$probed")
  }

  test("ivfTopK: high recall on clustered vectors, deterministic output") {
    val rnd = new scala.util.Random(5)
    val centers = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def run() = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding",
        k = 5, nLists = 8, nProbe = 2)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    val once = run()
    val got = once.map { case (q, n, _) => (q, n) }
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
    // fully deterministic pipeline: identical bits on a second run
    assert(run() == once)
  }

  test("ivfTopKMatryoshka: full-dim routing degenerates to ivfTopK; " +
      "prefix routing keeps recall on clustered vectors") {
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    // routeDims = full dimension ⇒ the same index, probes and scores
    // as plain ivfTopK, bit for bit
    val plain = rows(Similarity.ivfTopK(queries, vecs, "vec_id",
      "embedding", k = 5, nLists = 8, nProbe = 2))
    val fullRoute = rows(Similarity.ivfTopKMatryoshka(queries, vecs,
      "vec_id", "embedding", k = 5, nLists = 8, nProbe = 2,
      routeDims = 16))
    assert(fullRoute == plain)
    // 4-dim prefix routing: scores stay FULL-dim exact (any candidate
    // the router surfaces is ranked by true cosine), recall stays high
    // on cluster-structured vectors
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val mrl = rows(Similarity.ivfTopKMatryoshka(queries, vecs, "vec_id",
      "embedding", k = 5, nLists = 8, nProbe = 2, routeDims = 4))
    val got = mrl.map { case (q, _, n, _) => (q, n) }
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
    // exact-score property: every returned cosine equals the brute
    // cosine for that (query, neighbor) pair
    val bruteCos = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 99)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    mrl.foreach { case (q, r, n, c) =>
      assert(bruteCos((q, n)) == c, s"full-dim score for ($q,$n) rank $r")
    }
  }

  test("kmeansFit recovers planted clusters, deterministic across partitioning") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(vecs, "vec_id", "embedding",
      k = 3, iters = 3)
    val assigned = Similarity.assignToCentroids(
        vecs.select($"vec_id".as("cid"), $"embedding".as("cv")), cents)
      .select($"cid", $"cent_id").as[(Long, Int)].collect()
    // every planted cluster (i % 3) maps to exactly one learned centroid
    val byPlanted = assigned.groupBy(_._1 % 3)
      .map { case (p, xs) => p -> xs.map(_._2).toSet }
    assert(byPlanted.values.forall(_.size == 1), byPlanted)
    assert(byPlanted.values.flatten.toSet.size == 3, "centroids distinct")
    // deterministic across partitioning (the oracle property)
    val again = Similarity.kmeansFit(vecs.repartition(7), "vec_id",
        "embedding", k = 3, iters = 3)
      .select($"cent_id", $"centv").as[(Int, Array[Float])]
      .collect().sortBy(_._1).map { case (c, v) => (c, v.toSeq) }.toSeq
    val first = cents.select($"cent_id", $"centv")
      .as[(Int, Array[Float])].collect().sortBy(_._1)
      .map { case (c, v) => (c, v.toSeq) }.toSeq
    assert(first == again)
  }

  test("ivfTopK with kmeansFit centroids: trained index, perfect recall on clusters") {
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val trained = Similarity.kmeansFit(vecs, "vec_id", "embedding",
      k = 3, iters = 3)
    val ivf = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding",
        k = 5, nLists = 3, nProbe = 1, centroids = Some(trained))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // tight planted clusters + trained centroids: probing ONE list per
    // query already recovers the exact top-5
    assert(ivf == brute, s"missing: ${brute -- ivf}")
  }

  test("int8-quantized brute-force ANN: recall ≥0.9 vs exact top-5") {
    // cosine is invariant to the per-vector positive scale, so ANN over
    // the quantized bytes needs no dequantization — only the rounding
    // error perturbs rankings
    val rnd = new scala.util.Random(23)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.1f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val qvecs = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select($"id".as("vec_id"),
        org.apache.spark.sql.functions.transform($"q",
          _.cast("float")).as("embedding"))
    def top5(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(corpus.filter($"vec_id" < 8), corpus,
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect().toSet
    val exact = top5(vecs)
    val quant = top5(qvecs)
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("semanticDupPairs: subset of exact pairs; finds same-cluster dups") {
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian().toFloat))
    // 30 vectors in 3 tight planted clusters + 3 exact duplicates
    val base = (0 until 30).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val dups = (0 until 3).map(i => (100L + i, base(i)._2.clone()))
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val sem = CacheScope.scoped {
      Similarity.semanticDupPairs(vecs, "vec_id", "embedding",
          k = 3, iters = 3, threshold = 0.999)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    }
    // each exact duplicate pair shares a cluster → must be found
    (0 until 3).foreach { i =>
      assert(sem.contains((i.toLong, 100L + i)), s"missing dup $i")
    }
    // subset of the brute-force truth at the same threshold
    val all = vecs.select($"vec_id".as("id_a"), $"embedding".as("va"))
      .crossJoin(vecs.select($"vec_id".as("id_b"), $"embedding".as("vb")))
      .filter($"id_a" < $"id_b")
      .withColumn("cos", org.apache.spark.sql.functions.expr(
        "cosine_sim(va, vb)"))
      .filter($"cos" >= 0.999)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(all))
  }

  test("ivfPqTopK: residual-coded search recalls the exact L2 top-k " +
      "on clustered vectors; fully deterministic") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val data = (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val vecs = data.toDF("vec_id", "embedding")
    def run() = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        nLists = 4, nProbe = 2, m = 4, k = 8, dim = 8,
        nQueries = 4, topK = 5)
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    val once = run()
    // ranks contiguous 1..5 per query
    assert(once.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._5).sorted == Seq(1L, 2L, 3L, 4L, 5L) })
    // cluster retrieval: every cluster routes to ONE list together, so
    // probing the query's closest lists must surface mostly cluster-
    // mates. (Exact-L2 recall@5 INSIDE a 0.05-σ cluster is the wrong
    // bar — an 8-entry residual codebook cannot resolve sub-code
    // distances; ADC ties break by id. The exact re-rank column exists
    // for precisely that final ordering.)
    val sameCluster = once.count { case (q, n, _, _, _) =>
      n % 4 == q % 4 }.toDouble / once.size
    assert(sameCluster >= 0.8, s"same-cluster frac=$sameCluster")
    // the exact-L2 column matches a scalar recomputation
    val byId = data.toMap
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    once.foreach { case (q, n, _, l2r6, _) =>
      assert(math.abs(l2r6 - l2(byId(q), byId(n))) < 1e-5) }
    assert(run() == once) // bit-deterministic end to end
  }

  test("hyperplane signature is deterministic and separates clusters") {
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(-5.0f, 3.0f, -2.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val sigs = vecs.select($"vec_id",
        VectorFunctions.hyperplaneSignature($"embedding", 16, 42).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L))       // identical vectors, identical sig
    assert(sigs(0L) != sigs(2L))       // distant vectors split
  }

  test("rpTreeRoute: leaf assignment equals a local reimplementation " +
    "(same folds, rank-picked medians); leaves balanced and partition " +
    "the corpus") {
    val rnd = new scala.util.Random(17)
    val n = 97
    val dims = 8
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian().toFloat)))
    val depth = 3
    val got = CacheScope.scoped {
      val (routed, _) = Similarity.rpTreeRoute(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        depth, dims)
      routed.select($"id", $"node").as[(Long, Int)].collect().toMap
    }
    // distributed tier (probe forced to fall through) must agree
    val gotDist = CacheScope.scoped {
      val (routed, _) = Similarity.rpTreeRoute(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        depth, dims, smallProjLimit = 0L)
      routed.select($"id", $"node").as[(Long, Int)].collect().toMap
    }
    assert(got == gotDist, "driver vs distributed tier")
    // local replay: identical left fold, identical median rule
    val want = rpLocal(vecs, depth, dims)
    assert(got == want)
    val sizes = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.sum == n)
    assert(sizes.size == (1 << depth))
    // lower-median splits keep every leaf within ceil(n / 2^depth) + 1
    assert(sizes.values.max <= n / (1 << depth) + 2,
      s"unbalanced: $sizes")
  }

  /** Local RP-tree replay used by the parity test. */
  private def rpLocal(vecs: Seq[(Long, Array[Float])], depth: Int,
      dims: Int): Map[Long, Int] = {
    def proj(v: Array[Float], j: Int): Double =
      (0 until dims).foldLeft(0.0)((acc, i) =>
        acc + v(i).toDouble * Similarity.hyperplaneSign(0, j, i))
    var assign = vecs.map { case (id, v) => (id, v, 0) }
    for (j <- 0 until depth) {
      assign = assign.groupBy(_._3).toSeq.flatMap { case (nd, vs) =>
        val ranked = vs.map(t => (t._1, t._2, proj(t._2, j)))
          .sortBy(t => (t._3, t._1))
        val thr = ranked((ranked.length + 1) / 2 - 1)._3
        vs.map { case (id, v, _) =>
          val p = proj(v, j)
          (id, v, nd * 2 + (if (p <= thr) 0 else 1))
        }
      }
    }
    assign.map(t => t._1 -> t._3).toMap
  }

  test("rpTreeTopK recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rp = CacheScope.scoped {
      Similarity.rpTreeTopK(queries, vecs, "vec_id", "embedding", 5,
          depth = 2, dims = 16)
        .select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toSet
    }
    val recall = brute.intersect(rp).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("rpForestTopK: driver and forced-distributed tiers agree " +
    "bit-for-bit; spill forest recall ≥ the single tree's") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    def run(projLimit: Long) = CacheScope.scoped {
      Similarity.rpForestTopK(queries, vecs, "vec_id", "embedding", 5,
          nTrees = 2, depth = 2, dims = 16, spillPct = 10,
          smallProjLimit = projLimit)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    }
    val local = run(1L << 20)
    val dist = run(0L) // probe forced to fall through → Prefix path
    assert(local == dist, "driver vs distributed tier")
    val brute = Similarity.bruteForceTopK(queries, vecs,
        "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toSet
    val single = CacheScope.scoped {
      Similarity.rpTreeTopK(queries, vecs, "vec_id", "embedding", 5,
          depth = 2, dims = 16)
        .select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toSet
    }
    val fr = local.map(t => (t._1, t._3))
    assert(brute.intersect(fr).size >= brute.intersect(single).size,
      s"forest ${brute.intersect(fr).size} < tree " +
        s"${brute.intersect(single).size} hits")
  }

  test("rpForestTopKGrid: every grid point equals the standalone " +
    "rpForestTopK with the same knobs, on BOTH tiers") {
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val grid = Seq((1, 5), (2, 5), (2, 15))
    for (projLimit <- Seq(1L << 20, 0L)) {
      val swept = CacheScope.scoped {
        Similarity.rpForestTopKGrid(queries, vecs, "vec_id",
            "embedding", 5, grid, depth = 2, dims = 16,
            smallProjLimit = projLimit)
          .select("trees", "spill", "query_id", "rank", "neighbor_id")
          .as[(Int, Int, Long, Int, Long)].collect().toSet
      }
      for ((t, s) <- grid) {
        val solo = CacheScope.scoped {
          Similarity.rpForestTopK(queries, vecs, "vec_id",
              "embedding", 5, nTrees = t, depth = 2, dims = 16,
              spillPct = s, smallProjLimit = projLimit)
            .select("query_id", "rank", "neighbor_id")
            .as[(Long, Int, Long)].collect()
            .map(r => (t, s, r._1, r._2, r._3)).toSet
        }
        assert(swept.filter(r => r._1 == t && r._2 == s) == solo,
          s"grid point ($t, $s) diverges at projLimit=$projLimit")
      }
    }
  }

  test("rpTreeRoute spill bands: lo ≤ thr ≤ hi, all achieved " +
    "projection values; spillPct=0 degenerates to lo = thr = hi") {
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    for (spill <- Seq(0, 10)) CacheScope.scoped {
      val (_, thrs) = Similarity.rpTreeRoute(vecs, "vec_id",
        "embedding", depth = 2, dims = 8, spillPct = spill)
      for (f <- thrs; r <- f.select("thr", "lo", "hi").collect()) {
        val (thr, lo, hi) =
          (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(lo <= thr && thr <= hi)
        if (spill == 0) assert(lo == thr && thr == hi)
      }
    }
  }
}
