package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic operator invariants under generated inputs (SURVEY.md §5):
  * properties that must hold for ANY data, not just the fixtures.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic forAll over raw ScalaCheck generators (the
    * scalatest-scalacheck bridge isn't in the offline dep cache).
    */
  private def forAll[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    (0 until 5).foreach { i =>
      body(g1.pureApply(Gen.Parameters.default, Seed(42L + i)),
        g2.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }
  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private val rows: Gen[List[(Long, Double, String)]] =
    Gen.listOfN(60, for {
      k <- Gen.chooseNum(0L, 9L)
      v <- Gen.chooseNum(-100.0, 100.0)
      s <- Gen.oneOf("a", "b", "c", "")
    } yield (k, v, s))

  test("filter fusion: filter(p).filter(q) == filter(p && q)") {
    forAll(rows) { data =>
      val df = data.toDF("k", "v", "s")
      val p = col("v") > 0
      val q = col("k") % 2 === 0
      val a = df.filter(p).filter(q).collect().toSet
      val b = df.filter(p && q).collect().toSet
      assert(a == b)
    }
  }

  test("union row-count additivity; except/intersect partition counts") {
    forAll(rows, rows) { (d1, d2) =>
      val a = d1.toDF("k", "v", "s").select("k")
      val b = d2.toDF("k", "v", "s").select("k")
      assert(a.unionAll(b).count() == a.count() + b.count())
      // |A| = |A∩B strict| + |A\B strict| under ALL (multiset) semantics
      assert(a.intersectAll(b).count() + a.exceptAll(b).count()
        == a.count())
    }
  }

  test("dedup idempotence: dropDuplicates twice == once") {
    forAll(rows) { data =>
      val df = data.toDF("k", "v", "s")
      val once = df.dropDuplicates("k").count()
      val twice = df.dropDuplicates("k").dropDuplicates("k").count()
      assert(once == twice)
      assert(once == data.map(_._1).distinct.size)
    }
  }

  test("window partition sum totals equal groupBy sums") {
    forAll(rows) { data =>
      val df = data.toDF("k", "v", "s")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      val viaWindow = df
        .withColumn("ws", sum(col("v")).over(w))
        .select("k", "ws").distinct()
        .as[(Long, Double)].collect().toMap
      val viaGroup = df.groupBy("k").agg(sum("v").as("gs"))
        .as[(Long, Double)].collect().toMap
      assert(viaWindow.keySet == viaGroup.keySet)
      viaGroup.foreach { case (k, gs) =>
        assert(math.abs(viaWindow(k) - gs) < 1e-9)
      }
    }
  }

  test("as-of join preserves every left row exactly once") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evGen = Gen.listOfN(30, for {
      k <- Gen.chooseNum(0L, 3L); dt <- Gen.chooseNum(0L, 100000L)
    } yield (k, new java.sql.Timestamp(ts0 + dt)))
    forAll(evGen, evGen) { (lRows, rRows) =>
      whenever(lRows.nonEmpty) {
        val l = lRows.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("lid", "k", "t")
        val r = rRows.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("rid", "k", "t")
          .groupBy("k", "t").agg(max("rid").as("rid"))
        val joined = graft.ops.AsOf.asOfJoin(l, r, "k", "k", "t", "t",
          Seq("rid"))
        assert(joined.count() == lRows.size)
        assert(joined.select("lid").distinct().count() == lRows.size)
      }
    }
  }

  test("minhash est-jaccard of identical sets is 1, disjoint-ish below") {
    forAll(Gen.alphaStr.suchThat(_.length > 20)) { s =>
      val docs = Seq((0L, s), (1L, s)).toDF("doc_id", "text")
      val est = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
        threshold = 0.0)
      val v = est.select("est_jaccard").as[Double].collect()
      assert(v.forall(_ == 1.0))
    }
  }

  test("int8 quantization: |q| ≤ 127, rmse ≤ scale/2, zero-vector safe") {
    val vecGen: Gen[List[Array[Float]]] =
      Gen.listOfN(8, Gen.listOfN(6,
        Gen.chooseNum(-50.0, 50.0).map(_.toFloat)).map(_.toArray))
    forAll(vecGen) { vs =>
      val withZero = vs :+ Array.fill(6)(0.0f)
      val df = withZero.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val out = graft.ops.Similarity
        .quantizeInt8(df, "vec_id", "embedding")
        .select($"id", $"scale", $"q", $"rmse")
        .as[(Long, Double, Seq[Byte], Double)].collect()
      out.foreach { case (_, scale, q, rmse) =>
        assert(q.forall(b => b >= -127 && b <= 127))
        // per-dim rounding error ≤ scale/2 → rmse ≤ scale/2
        assert(rmse <= scale / 2 + 1e-12, s"rmse=$rmse scale=$scale")
        assert(!rmse.isNaN && !scale.isNaN)
      }
    }
  }

  test("merge idempotence: upsert(base, base) == base; empty updates no-op") {
    forAll(rows) { data =>
      val base = data.zipWithIndex
        .map { case ((_, v, s), i) => (i.toLong, v, s) }
        .toDF("k", "v", "s")
      val self = graft.ops.Merge.upsert(base, base, "k")
        .collect().toSet
      assert(self == base.collect().toSet)
      val noop = graft.ops.Merge.upsert(base, base.limit(0), "k")
        .collect().toSet
      assert(noop == base.collect().toSet)
    }
  }

  test("redaction idempotence: redact(redact(x)) == redact(x)") {
    val texts = Gen.oneOf(
      "mail a.b@c.io and x@y.org now",
      "call 555-123-4567 or +1-800-555-0199",
      "clean text with no pii at all",
      "mixed bob@corp.io 555-123-4567 tail")
    forAll(texts) { t =>
      val once = spark.range(1)
        .select(graft.ops.TextAnalysis.redactPii(lit(t)).as("r"))
        .as[String].head()
      val twice = spark.range(1)
        .select(graft.ops.TextAnalysis.redactPii(lit(once)).as("r"))
        .as[String].head()
      assert(once == twice)
    }
  }

  test("morton2: bounded by 4^bits, zero iff both zero, distinct on grid") {
    val xy = for {
      x <- Gen.chooseNum(0L, 255L); y <- Gen.chooseNum(0L, 255L)
    } yield (x, y)
    forAll(Gen.listOfN(20, xy)) { pts =>
      val df = pts.toDF("x", "y")
      val zs = df.select($"x", $"y",
          graft.ops.ZOrder.morton2($"x", $"y", 8).as("z"))
        .as[(Long, Long, Long)].collect()
      zs.foreach { case (x, y, z) =>
        assert(z >= 0 && z < (1L << 16))
        assert((z == 0) == (x == 0 && y == 0))
      }
      // interleave is injective on the 8-bit grid
      assert(zs.map(_._3).distinct.length ==
        pts.distinct.length)
    }
  }

  test("KLL sketch: weight conserved and rank error bounded for ANY " +
    "input and ANY merge split") {
    import graft.functions.KllQuantileAgg
    val inputs: Gen[List[Double]] = Gen.listOfN(4000,
      Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.chooseNum(0.0, 1.0),            // dense cluster
        Gen.chooseNum(0L, 50L).map(_.toDouble))) // heavy ties
    val agg = new KllQuantileAgg(128)
    def sketch(xs: Seq[Double]) =
      xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    forAll(inputs, Gen.chooseNum(1, 3999)) { (xs, cut) =>
      val merged = agg.merge(sketch(xs.take(cut)), sketch(xs.drop(cut)))
      val summary = agg.finish(merged)
      assert(summary.map(_._2).sum == xs.size.toLong,
        "total weight must equal n under any merge split")
      val sorted = xs.sorted
      Seq(0.25, 0.5, 0.75).foreach { p =>
        val est = KllQuantileAgg.estimate(summary, p)
        // exact rank window of the estimate vs target rank, generous
        // bound (ε ≈ 4·log2(n/k)/(2k) ≈ 0.08 for n=4000, k=128)
        val lo = sorted.count(_ < est)
        val hi = sorted.count(_ <= est)
        val target = p * xs.size
        assert(target >= lo - 0.08 * xs.size
          && target <= hi + 0.08 * xs.size,
          s"p=$p est=$est rank window [$lo,$hi] target $target")
      }
    }
  }

  test("ssspBounded equals scalar Bellman–Ford truncated at R edges " +
    "on random weighted digraphs") {
    val graphs: Gen[List[(Long, Long, Long)]] =
      Gen.listOfN(30, for {
        s <- Gen.chooseNum(0L, 7L)
        d <- Gen.chooseNum(0L, 7L)
        w <- Gen.chooseNum(1L, 9L)
      } yield (s, d, w))
    def scalar(edges: Seq[(Long, Long, Long)], src: Long, rounds: Int)
        : Map[Long, Long] = {
      var dist = Map(src -> 0L)
      for (_ <- 1 to rounds) {
        val relaxed = edges.flatMap { case (s, d, w) =>
          dist.get(s).map(ds => d -> (ds + w)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .view.mapValues(_.map(_._2).min).toMap
      }
      dist
    }
    forAll(graphs, n = 4) { data =>
      whenever(data.nonEmpty) {
        // multi-edges collapse to min weight like the query's groupBy
        val edges = data.groupBy(e => (e._1, e._2))
          .map { case ((s, d), es) => (s, d, es.map(_._3).min) }.toSeq
        val got = graft.ops.Graph
          .ssspBounded(edges.toDF("src", "dst", "w"), source = 0L,
            rounds = 3)
          .as[(Long, Long)].collect().toMap
        assert(got == scalar(edges, 0L, 3), s"edges=$edges")
      }
    }
  }

  test("property: kTruss matches the scalar fixpoint on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(25, for {
        a <- Gen.chooseNum(1L, 9L); b <- Gen.chooseNum(1L, 9L)
      } yield (a, b))
    // scalar twin of the SAME bounded-round contract: `peels` filter
    // rounds, then support within the surviving subgraph
    def scalarTruss(edges: Seq[(Long, Long)], k: Int, peels: Int)
        : Map[(Long, Long), Int] = {
      var e = edges.filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).distinct.toSet
      def support(s: Set[(Long, Long)]): Map[(Long, Long), Int] = {
        def adj(v: Long) = s.collect {
          case (a, b) if a == v => b; case (a, b) if b == v => a
        }
        s.map(p => p -> (adj(p._1) & adj(p._2)).size).toMap
      }
      for (_ <- 1 to peels) {
        val sup = support(e)
        e = e.filter(p => sup(p) >= k - 2)
      }
      support(e)
    }
    forAll(edgeGen, 3) { edges =>
      val want = scalarTruss(edges, 4, 4)
      val got = graft.ops.Graph
        .kTruss(edges.toDF("src", "dst"), k = 4, peels = 4)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3.toInt).toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("property: CDC chunking matches the scalar cut rule and " +
    "partitions the text exactly on random corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent direct evaluation of the rolling window-hash family
    // (graft.functions.RollingHash) — plain per-window fold
    def winHash(s: String): Long = {
      var h1 = 0L; var h2 = 0L
      s.codePoints().forEach { c =>
        h1 = (h1 * 131 + c) % 2147483647L
        h2 = (h2 * 131 + c) % 2147483629L
      }
      h1 * 2147483629L + h2
    }
    def chunksOf(text: String): Seq[String] = {
      val interior = (8 to text.length).filter { i =>
        winHash(text.substring(i - 8, i)) % 32 == 0
      }
      val cuts = (Seq(0) ++ interior ++ Seq(text.length))
        .distinct.sorted
      cuts.sliding(2).collect { case Seq(a, b) =>
        text.substring(a, b) }.toSeq
    }
    val docGen: Gen[List[String]] = Gen.listOfN(4,
      Gen.listOfN(120, Gen.alphaLowerChar).map(_.mkString))
    forAll(docGen, 3) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "web", t.length.toLong)
      }
      val dir = java.nio.file.Files.createTempDirectory("pcdc").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = graft.queries.TextQueries.qTextCdcDedup(spark, dir)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, n, k, d) => id -> ((n, k, d)) }.toMap
      // scalar keep-first replay — and the partition property: chunks
      // reassemble the text exactly
      val seen = scala.collection.mutable.Set.empty[String]
      for ((t, i) <- texts.zipWithIndex) {
        val cs = chunksOf(t)
        assert(cs.mkString == t, "chunks must partition the text")
        var kept = 0L; var dup = 0L
        cs.foreach(c =>
          if (seen.add(md5hex(c))) kept += 1 else dup += c.length)
        assert(got(i.toLong) == ((cs.size.toLong, kept, dup)),
          s"doc $i")
      }
    }
  }

  test("property: KS equals the scalar two-sample statistic on " +
    "random samples") {
    val valGen: Gen[List[(String, Int)]] = Gen.listOfN(50, for {
      t <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(1, 20)
    } yield (t, v))
    forAll(valGen, 3) { vs =>
      whenever(vs.exists(_._1 == "a") && vs.exists(_._1 == "b")) {
        val dir = java.nio.file.Files.createTempDirectory("pks").toString
        vs.zipWithIndex.map { case ((t, v), i) =>
          (i.toLong, new java.sql.Timestamp(0L), i.toLong % 7, t,
            v.toDouble, "{}")
        }.toDF("event_id", "ts", "user_id", "event_type", "value",
          "props").write.parquet(s"$dir/events.parquet")
        val r = graft.queries.StatsQueries.qStatKs(spark, dir)
          .as[(String, String, Long, Long, Long, Long, Double)].head()
        val as = vs.filter(_._1 == "a").map(_._2 * 100L)
        val bs = vs.filter(_._1 == "b").map(_._2 * 100L)
        val pts = (as ++ bs).distinct.sorted
        val dnums = pts.map(v =>
          math.abs(as.count(_ <= v).toLong * bs.size -
            bs.count(_ <= v).toLong * as.size))
        val dmax = dnums.max
        val at = pts(dnums.indexOf(dmax))
        assert(r._5 == dmax && r._6 == at,
          s"vs=$vs got=$r want=($dmax,$at)")
        assert(r._5 >= 0 && r._5 <= as.size.toLong * bs.size)
      }
    }
  }

  test("dHash banding pigeonhole: ANY pair within the Hamming budget " +
    "shares at least one slice") {
    val hashes: Gen[Long] = Gen.long
    val flips: Gen[List[Int]] =
      Gen.listOfN(3, Gen.chooseNum(0, 63))
    val bands = 4 // maxHamming = 3 ⇒ 4 slices of 16 bits
    def slices(h: Long): Seq[Long] =
      (0 until bands).map(i => (h >>> (i * 16)) & 0xffffL)
    forAll(hashes, flips) { (h, fs) =>
      val h2 = fs.foldLeft(h)((x, b) => x ^ (1L << b))
      val d = java.lang.Long.bitCount(h ^ h2)
      whenever(d <= 3) {
        assert(slices(h).zip(slices(h2)).exists { case (a, b) => a == b },
          s"pair at Hamming $d must collide in ≥1 of $bands slices")
      }
    }
  }
}
