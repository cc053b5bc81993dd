package graft.ops

import graft.SparkTestBase
import Selection.{AbsDiffs, WalshSums}

/** [[Selection.kthPairwise]] must equal explicit enumeration of the
  * pairwise multiset on any input — the counting search never sees a
  * pair, so parity with brute force is the whole correctness argument.
  */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (String, Long)*) = rows.toDF("g", "v")

  private def bruteWalsh(xs: Seq[Long]): Seq[Long] =
    (for {
      i <- xs.indices; j <- i until xs.length
    } yield xs(i) + xs(j)).sorted

  private def bruteAbsDiff(xs: Seq[Long]): Seq[Long] =
    (for {
      i <- xs.indices; j <- (i + 1) until xs.length
    } yield math.abs(xs(i) - xs(j))).sorted

  test("hand-traced Walsh median: {1,2,6} -> sums {2,3,7,4,8,12}, " +
    "lower median 4") {
    val out = CacheScope.scoped {
      Selection.kthPairwise(df("a" -> 1L, "a" -> 2L, "a" -> 6L),
          WalshSums, (_, m) => (m + 1) / 2)
        .as[(String, Long, Long, Long, Long)].collect()
    }
    assert(out.toSeq == Seq(("a", 3L, 6L, 3L, 4L)))
  }

  test("hand-traced Qn rank on {0,3,3,10}: diffs {3,3,10,0,7,7}, " +
    "k=C(3,2)=3 -> 3") {
    val out = CacheScope.scoped {
      Selection.kthPairwise(
          df("a" -> 0L, "a" -> 3L, "a" -> 3L, "a" -> 10L),
          AbsDiffs, (n, _) => { val h = n / 2 + 1; h * (h - 1) / 2 })
        .as[(String, Long, Long, Long, Long)].collect()
    }
    // sorted diffs: 0,3,3,7,7,10 -> 3rd = 3
    assert(out.toSeq == Seq(("a", 4L, 6L, 3L, 3L)))
  }

  test("brute parity, every rank, heavy ties and negatives (both modes)") {
    val xs = Seq(-5L, -5L, 0L, 0L, 0L, 3L, 7L, 7L, 11L, 20L)
    val in = df(xs.map("a" -> _): _*)
    val walsh = bruteWalsh(xs)
    for (k <- Seq(1, 2, walsh.length / 2, walsh.length - 1, walsh.length)) {
      val got = CacheScope.scoped {
        Selection.kthPairwise(in, WalshSums, (_, _) => k.toLong)
          .select("value").as[Long].head()
      }
      assert(got == walsh(k - 1), s"walsh k=$k")
    }
    val diffs = bruteAbsDiff(xs)
    for (k <- Seq(1, 2, diffs.length / 2, diffs.length - 1, diffs.length)) {
      val got = CacheScope.scoped {
        Selection.kthPairwise(in, AbsDiffs, (_, _) => k.toLong)
          .select("value").as[Long].head()
      }
      assert(got == diffs(k - 1), s"absdiff k=$k")
    }
  }

  test("multi-group isolation + singleton drop under AbsDiffs") {
    val in = df("a" -> 1L, "a" -> 9L, "b" -> 4L, "b" -> 4L, "b" -> 40L,
      "lone" -> 5L)
    val walsh = CacheScope.scoped {
      Selection.kthPairwise(in, WalshSums, (_, m) => (m + 1) / 2)
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    // lone: single Walsh pair 5+5=10; a: {2,10,18} -> 10; b: {8,8,44,80,
    // 44,8}sorted {8,8,8,44,44,80} -> k=(6+1)/2=3 -> 8
    assert(walsh == Seq(("a", 2L, 3L, 2L, 10L), ("b", 3L, 6L, 3L, 8L),
      ("lone", 1L, 1L, 1L, 10L)))
    val qn = CacheScope.scoped {
      Selection.kthPairwise(in, AbsDiffs, (_, _) => 1L)
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    // singleton group has no pair and is dropped
    assert(qn.map(_._1) == Seq("a", "b"))
    assert(qn == Seq(("a", 2L, 1L, 1L, 8L), ("b", 3L, 3L, 1L, 0L)))
  }

  test("randomized brute parity across 6 seeded draws (both modes, " +
    "pseudomedian and Qn ranks)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 6) {
      val n = 3 + rnd.nextInt(40)
      val xs = Seq.fill(n)(rnd.nextInt(2000).toLong - 1000L)
      val in = df(xs.map("t" -> _): _*)
      val hlGot = CacheScope.scoped {
        Selection.kthPairwise(in, WalshSums, (_, m) => (m + 1) / 2)
          .select("value").as[Long].head()
      }
      val w = bruteWalsh(xs)
      assert(hlGot == w((w.length + 1) / 2 - 1), s"trial $trial walsh")
      if (n >= 2) {
        val k = { val h = n / 2 + 1; h.toLong * (h - 1) / 2 }
        val qnGot = CacheScope.scoped {
          Selection.kthPairwise(in, AbsDiffs, (_, _) => k)
            .select("value").as[Long].head()
        }
        val d = bruteAbsDiff(xs)
        assert(qnGot == d(k.toInt - 1), s"trial $trial qn")
      }
    }
  }

  test("kOf out of range fails loudly") {
    intercept[IllegalArgumentException] {
      Selection.kthPairwise(df("a" -> 1L, "a" -> 2L), WalshSums,
        (_, m) => m + 1)
    }
  }

  test("all THREE tiers agree (driver; executor-local groups via " +
    "smallHistLimit = 0; probe loop via perGroupHistLimit = 0 too) " +
    "on random multi-group draws") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val rows = (1 to 60).map(_ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(500).toLong - 250L))
      val in = df(rows: _*)
      for (mode <- Seq(WalshSums, AbsDiffs)) {
        val kOf: (Long, Long) => Long = (_, m) => (m + 1) / 2
        val (driver, exec, probe) = CacheScope.scoped {
          (Selection.kthPairwise(in, mode, kOf)
            .as[(String, Long, Long, Long, Long)].collect().toSet,
            Selection.kthPairwise(in, mode, kOf, smallHistLimit = 0L)
              .as[(String, Long, Long, Long, Long)].collect().toSet,
            Selection.kthPairwise(in, mode, kOf, smallHistLimit = 0L,
                perGroupHistLimit = 0L)
              .as[(String, Long, Long, Long, Long)].collect().toSet)
        }
        assert(driver == exec, s"trial $trial $mode driver vs exec")
        assert(driver == probe, s"trial $trial $mode driver vs probe")
      }
    }
  }

  test("executor-local group tier: a group whose histogram exceeds " +
    "perGroupHistLimit falls through to the probe loop, same answer") {
    val rnd = new scala.util.Random(43)
    // g0 has 40 distinct values (> limit 16), g1 has 5
    val rows = (1 to 40).map(i => ("g0", (i * 7).toLong)) ++
      (1 to 20).map(_ => ("g1", rnd.nextInt(5).toLong))
    val in = df(rows: _*)
    val kOf: (Long, Long) => Long = (_, m) => (m + 1) / 2
    val (viaExec, viaProbe) = CacheScope.scoped {
      (Selection.kthPairwise(in, WalshSums, kOf, smallHistLimit = 0L,
          perGroupHistLimit = 16L)
        .as[(String, Long, Long, Long, Long)].collect().toSet,
        Selection.kthPairwise(in, WalshSums, kOf, smallHistLimit = 0L,
            perGroupHistLimit = 0L)
          .as[(String, Long, Long, Long, Long)].collect().toSet)
    }
    assert(viaExec == viaProbe)
  }
}
