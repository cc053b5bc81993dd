package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** PSI / Benford / Gini against closed-form planted cases. */
class StatsMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("PSI: identical halves are exactly 0/stable; a full shift " +
    "matches the closed form and reads action") {
    val dir = java.nio.file.Files.createTempDirectory("psi").toString
    var id = 0L
    def burst(et: String, day: Int, v: Double, n: Int) =
      (0 until n).map { i =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:00:00"),
          id % 5, et, v, "{}")
      }
    // 'a': ref days all 1.00, fresh days all 9.00 (total shift);
    // 'b': identical 2.00 streams with EQUAL counts per half
    val rows =
      (1 to 15).flatMap(d => burst("a", d, 1.00, 4)) ++
        (16 to 30).flatMap(d => burst("a", d, 9.00, 4)) ++
        (1 to 15).flatMap(d => burst("b", d, 2.00, 4)) ++
        (16 to 30).flatMap(d => burst("b", d, 2.00, 4))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val got = StatsQueries.qStatPsi(spark, dir)
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    // 'a': two buckets, cr=(60,0), cf=(0,60), smoothing +1 over 62:
    // psi = (61/62 − 1/62)·ln(61) · 2
    val psiA = r6(2.0 * (60.0 / 62.0) * math.log(61.0))
    assert(got("a")._4 == psiA && got("a")._5 == "action")
    assert(got("b")._4 == 0.0 && got("b")._5 == "stable")
  }

  test("Benford: planted digit counts and chi-square contributions") {
    val dir = java.nio.file.Files.createTempDirectory("benf").toString
    // cents first digits: 1.23→123 (1), 0.45→45 (4), 9.99→999 (9),
    // 1.00→100 (1)
    val vals = Seq(1.23, 0.45, 9.99, 1.00)
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong, "O", v,
        Timestamp.valueOf("2024-01-01 00:00:00"), "1-P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = StatsQueries.qStatBenford(spark, dir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1, 2L), (4, 1L), (9, 1L)))
    val e1 = math.log10(2.0) * 4
    assert(got.head._3 == r6(e1))
    assert(got.head._4 == r6((2 - e1) * (2 - e1) / e1))
  }

  test("Gini: equal amounts give exactly 0; single owner gives " +
    "(n-1)/n") {
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    val cust = (1L to 8L).map(c =>
      (c, s"c$c", 1, 0.0, if (c <= 4) "EQ" else "ONE"))
    cust.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment").write.parquet(s"$dir/customer.parquet")
    // EQ: four orders of 25.00 each; ONE: three zeros + one 100.00
    val orders = Seq(
      (1L, 1L, 25.0), (2L, 2L, 25.0), (3L, 3L, 25.0), (4L, 4L, 25.0),
      (5L, 5L, 0.0), (6L, 6L, 0.0), (7L, 7L, 0.0), (8L, 8L, 100.0))
    orders.map { case (ok, c, v) =>
      (ok, c, "O", v, Timestamp.valueOf("2024-01-01 00:00:00"), "1-P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = StatsQueries.qStatGini(spark, dir)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("EQ")._4 == 0.0 && got("EQ")._3 == 100.0)
    assert(got("ONE")._4 == 3.0 / 4.0 && got("ONE")._3 == 100.0)
  }

  test("kruskal: fully separated groups hand-compute to H=12.5, " +
    "Hc=14.0 and reject; the exact verdict agrees with the doubles") {
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    var id = 0L
    // type a: 1 event/day, b: 10/day, c: 20/day over days 1..5 →
    // within-group all-tied daily counts {1},{10},{20}; no overlap.
    // Ranks: R_a=15, R_b=40, R_c=65; H = 12/240·1210 − 48 = 12.5;
    // ΣT = 3·(5³−5) = 360, C = 1 − 360/3360 → Hc = 14.0 exactly.
    val rows = for {
      (et, perDay) <- Seq(("a", 1), ("b", 10), ("c", 20))
      d <- 1 to 5
      i <- 1 to perDay
    } yield {
      id += 1
      (id, Timestamp.valueOf(f"2024-01-0$d ${i % 24}%02d:00:00"),
        id % 5, et, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val r = StatsQueries.qStatKruskal(spark, dir)
      .as[(Long, Long, Long, Double, Double, Boolean)].collect().head
    assert(r == ((3L, 15L, 360L, 12.5, 14.0, true)))
  }

  test("kruskal: identical group distributions sit exactly at H=0, " +
    "no reject") {
    val dir = java.nio.file.Files.createTempDirectory("kw0").toString
    var id = 0L
    // every type: 2 days of 1 event + 2 days of 2 events → identical
    // distributions, H exactly 0 (6084/156 = 39 is an exact double)
    val rows = for {
      et <- Seq("a", "b", "c")
      (d, perDay) <- Seq((1, 1), (2, 1), (3, 2), (4, 2))
      i <- 1 to perDay
    } yield {
      id += 1
      (id, Timestamp.valueOf(f"2024-01-0$d 0$i:00:00"),
        id % 5, et, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val r = StatsQueries.qStatKruskal(spark, dir)
      .as[(Long, Long, Long, Double, Double, Boolean)].collect().head
    assert(r._4 == 0.0 && r._5 == 0.0 && !r._6)
  }

  test("kendall: perfect concordance is tau=1 and rejects; planted " +
    "y-ties count into ties_y and tau-b's denominator") {
    val dir = java.nio.file.Files.createTempDirectory("kt").toString
    var id = 0L
    def day(d: Int, clicks: Int, purchases: Int) =
      ((1 to clicks).map(_ => "click") ++
        (1 to purchases).map(_ => "purchase")).map { et =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
          id % 5, et, 1.0, "{}")
      }
    // days 1..5: (i clicks, i purchases) → all 10 pairs concordant
    (1 to 5).flatMap(d => day(d, d, d))
      .toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
    val r = StatsQueries.qStatKendall(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().head
    assert(r == ((5L, 10L, 10L, 0L, 0L, 0L, 1.0, true)))

    val dir2 = java.nio.file.Files.createTempDirectory("kt2").toString
    // days 1..4: x = 1..4, y = 1,1,2,2 → conc 4, ties_y 2,
    // tau = 4/√(6·4)
    Seq((1, 1), (2, 1), (3, 2), (4, 2)).flatMap { case (d, y) =>
      day(d, d, y)
    }.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir2/events.parquet")
    val r2 = StatsQueries.qStatKendall(spark, dir2)
      .as[(Long, Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().head
    assert(r2._1 == 4L && r2._3 == 4L && r2._4 == 0L &&
      r2._5 == 0L && r2._6 == 2L &&
      r2._7 == r6(4.0 / math.sqrt(24.0)))
  }

  test("spearman: monotone daily series hits rho = ±1 exactly and " +
    "rejects") {
    def mk(ys: Seq[Int]): String = {
      val dir = java.nio.file.Files.createTempDirectory("sp").toString
      var id = 0L
      val rows = ys.zipWithIndex.flatMap { case (y, i) =>
        val d = i + 1
        ((1 to d).map(_ => "click") ++ (1 to y).map(_ => "purchase"))
          .map { et =>
            id += 1
            (id, Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
              id % 5, et, 1.0, "{}")
          }
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
      dir
    }
    val up = StatsQueries.qStatSpearman(spark, mk(Seq(2, 4, 6, 8, 10)))
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().head
    assert(up._1 == 5L && up._5 == 1.0 && up._6)
    val dn = StatsQueries.qStatSpearman(spark, mk(Seq(10, 8, 6, 4, 2)))
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().head
    assert(dn._5 == -1.0 && dn._6)
  }

  test("runs test: hand-computed runs on planted daily volumes — " +
    "mild alternation accepts, strong alternation rejects") {
    def mk(vols: Seq[Int]): String = {
      val dir = java.nio.file.Files.createTempDirectory("ru").toString
      var id = 0L
      val rows = vols.zipWithIndex.flatMap { case (v, i) =>
        (1 to v).map { _ =>
          id += 1
          (id, Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
            id % 5, "click", 1.0, "{}")
        }
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
      dir
    }
    // v = 10,20,11,21,12,22: lower median 12 dropped → signs −+−++ →
    // 4 runs of n=5 (3 pos, 2 neg): |z| < 1.96
    val a = StatsQueries.qStatRuns(spark,
      mk(Seq(10, 20, 11, 21, 12, 22)))
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(a == ((5L, 3L, 2L, 4L, false)))
    // 12 alternating days, median 6 dropped → −+−+−+−+−++ → 10 runs
    // of n=11: 2500·39²·10 > 9604·60·49 → reject
    val b = StatsQueries.qStatRuns(spark,
      mk(Seq(1, 101, 2, 102, 3, 103, 4, 104, 5, 105, 6, 106)))
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(b == ((11L, 6L, 5L, 10L, true)))
  }

  test("mann-kendall: a strictly rising series rejects at max S; a " +
    "flat series sits at S=0 and never rejects") {
    def mk(vols: Seq[Int]): String = {
      val dir = java.nio.file.Files.createTempDirectory("mk").toString
      var id = 0L
      vols.zipWithIndex.flatMap { case (v, i) =>
        (1 to v).map { _ =>
          id += 1
          (id, Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
            id % 5, "click", 1.0, "{}")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
      dir
    }
    val up = StatsQueries.qStatMannKendall(spark, mk((1 to 10).toSeq))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().head
    // S = 45 (all pairs rising), no ties → var_num18 = 10·9·25
    assert(up == (("click", 10L, 45L, 0L, 2250L, true)))
    val flat = StatsQueries.qStatMannKendall(spark, mk(Seq.fill(10)(7)))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().head
    assert(flat._3 == 0L && !flat._6)
  }

  test("moments: symmetric data has skew exactly 0; a balanced " +
    "two-point mass has excess kurtosis exactly -2") {
    def mk(qs: Seq[Long]): String = {
      val dir = java.nio.file.Files.createTempDirectory("mo").toString
      qs.zipWithIndex.map { case (q, i) =>
        (i.toLong, 1L, i.toLong, i + 1, q.toDouble, 10.0, 0.0, 0.0,
          "A", "O", Timestamp.valueOf("2024-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .write.parquet(s"$dir/lineitem.parquet")
      dir
    }
    val sym = StatsQueries.qAggMoments(spark, mk(Seq(1L, 2L, 3L)))
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(sym._7 == 0.0) // skew of {1,2,3}
    val twoPt = StatsQueries.qAggMoments(spark,
      mk(Seq(1L, 1L, 3L, 3L)))
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(twoPt._7 == 0.0 && twoPt._8 == -2.0)
  }

  test("jarque-bera: a symmetric light-tailed series accepts; one " +
    "wild spike rejects normality") {
    def mk(vols: Seq[Int]): String = {
      val dir = java.nio.file.Files.createTempDirectory("jb").toString
      var id = 0L
      vols.zipWithIndex.flatMap { case (v, i) =>
        (1 to v).map { _ =>
          id += 1
          (id, Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
            id % 5, "click", 1.0, "{}")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
      dir
    }
    val calm = StatsQueries.qStatJarque(spark,
      mk(Seq(9, 10, 11, 10, 9, 11, 10, 10, 9, 11, 10, 10)))
      .as[(String, Long, Double, Boolean)].collect().head
    assert(!calm._4 && calm._3 < 5.991)
    val spike = StatsQueries.qStatJarque(spark,
      mk(Seq(10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 90)))
      .as[(String, Long, Double, Boolean)].collect().head
    assert(spike._4 && spike._3 > 5.991)
  }

  test("levene (brown-forsythe): equal spreads accept; one wildly " +
    "dispersed group rejects homogeneity") {
    def mk(rows: Seq[(String, Seq[Int])]): String = {
      val dir = java.nio.file.Files.createTempDirectory("lv").toString
      var id = 0L
      rows.flatMap { case (et, vols) =>
        vols.zipWithIndex.flatMap { case (v, i) =>
          (1 to v).map { _ =>
            id += 1
            (id, Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
              id % 5, et, 1.0, "{}")
          }
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.parquet(s"$dir/events.parquet")
      dir
    }
    val same = StatsQueries.qStatLevene(spark, mk(Seq(
      ("a", Seq(10, 12, 10, 12, 10, 12)),
      ("b", Seq(20, 22, 20, 22, 20, 22)))))
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(same._1 == 2L && !same._4) // same |z| spread → F = 0
    assert(same._3 == 0.0)
    val het = StatsQueries.qStatLevene(spark, mk(Seq(
      ("a", Seq(11, 11, 11, 11, 11, 11)),
      ("b", Seq(1, 40, 1, 40, 1, 40)))))
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(het._4) // zero spread vs wild spread
  }

  test("cramers V: perfect association is exactly 1; independence " +
    "is exactly 0") {
    def mk(rows: Seq[(String, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("cv").toString
      rows.zipWithIndex.map { case ((st, pr), i) =>
        (i.toLong, i.toLong, st, 1.0,
          Timestamp.valueOf("2024-01-01 00:00:00"), pr)
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .write.parquet(s"$dir/orders.parquet")
      dir
    }
    val perfect = StatsQueries.qStatCramers(spark,
      mk(Seq.fill(5)(("O", "1-P")) ++ Seq.fill(5)(("F", "2-H"))))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(perfect == ((10L, 2L, 2L, 10.0, 1.0)))
    val indep = StatsQueries.qStatCramers(spark,
      mk(for { s <- Seq("O", "F"); p <- Seq("1-P", "2-H");
               _ <- 1 to 3 } yield (s, p)))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(indep._4 == 0.0 && indep._5 == 0.0)
  }

  test("mannWhitney: hand-computed 2U and tie term on a tied sample") {
    // A = {1,2}, B = {1,3}: avg ranks 1.5,1.5,3,4 → R_A = 4.5,
    // U_A = 4.5 - 3 = 1.5 → 2U = 3; one tie group of size 2 → ΣT = 6
    val s = Seq((true, 1L), (true, 2L), (false, 1L), (false, 3L))
      .toDF("isA", "v")
    val r = StatsQueries.mannWhitney(s)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(r == ((2L, 2L, 3L, 6L, false)))
  }

  test("mannWhitney: fully separated samples reject at alpha=0.05") {
    // A = 101..110 all above B = 1..10: U = 100 (max), z ≈ 3.78
    val s = ((101L to 110L).map(v => (true, v)) ++
      (1L to 10L).map(v => (false, v))).toDF("isA", "v")
    val r = StatsQueries.mannWhitney(s)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(r == ((10L, 10L, 200L, 0L, true)))
  }

  test("mannWhitney: identical samples sit at the null centre") {
    // A == B elementwise → 2U = mn exactly, never rejected
    val s = ((1L to 8L).map(v => (true, v)) ++
      (1L to 8L).map(v => (false, v))).toDF("isA", "v")
    val r = StatsQueries.mannWhitney(s)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(r._3 == r._1 * r._2) // 2U == mn
    assert(!r._5)
  }
}
