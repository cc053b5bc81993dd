package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.KllQuantileAgg

/** Sketch-narrowed EXACT quantiles — the standard 100 TB rank-query
  * path, in the same propose-then-certify discipline as the
  * Misra-Gries heavy hitters (`functions/MisraGriesAgg.scala`):
  *
  *  1. SKETCH pass: a mergeable KLL summary (one shuffle of
  *     O(k·log(n/k)) values) proposes, for each requested quantile p,
  *     a value band [lo_p, hi_p] = sketch(p−δ), sketch(p+δ).
  *  2. CERTIFY pass: one exact conditional-aggregation scan computes
  *     each proposal's true rank and each band's below-band offset;
  *     the published `rank_ok` asserts |rank(est_p) − p·n| ≤ ε·n in
  *     pure integer arithmetic.
  *  3. SELECT pass: rows inside a band (~2δ·n of them, the only data
  *     that is ever sorted) get a per-band row_number; the row at
  *     global rank ⌈p·n⌉ − offset_p is the EXACT p-quantile.
  *
  * The output is therefore exact and deterministic regardless of the
  * sketch's merge tree — sketch variation only moves the (certified)
  * band edges. If a band were ever to miss its true quantile the
  * output row for that p would be ABSENT (a loud failure), never a
  * silently wrong value.
  *
  * Driver-side state is bounded: the finished summary
  * (O(k·log(n/k)) pairs) and one aggregation row — the same "≤ k
  * candidates" contract as the heavy-hitter collect, never data rows.
  */
object Quantiles {

  /** Exact deciles (p = i/10 for the given i's) of `valueCol`, sketch
    * narrowed. Output: (p, exact_value, n, rank_ok), ordered by p.
    *
    * Ranks use integer arithmetic only — r_p = ⌈i·n/10⌉ = (i·n+9) div
    * 10 — so the oracle twin (same formula in SQL) is bit-identical;
    * a float p·n would round differently across engines at exact-tie
    * points. ε = 1/50 (0.02) certified as 5·|10·rank − i·n| ≤ n.
    */
  def sketchDeciles(df: DataFrame, valueCol: String,
                    tenths: Seq[Int] = 1 to 9,
                    k: Int = 1024, delta: Double = 0.05): DataFrame = {
    require(tenths.nonEmpty && tenths.forall(i => i >= 1 && i <= 9),
      "tenths must be within 1..9")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = CacheScope.cached(
      df.select(col(valueCol).cast("double").as("x"))
        .filter(col("x").isNotNull))

    // pass 1: count + sketch in one aggregation
    val kll = new KllQuantileAgg(k).asUdaf
    val sketchRow = vals.agg(count(lit(1)).as("n"), kll(col("x")).as("s"))
      .as[(Long, Seq[(Double, Long)])].head()
    val (n, summary) = sketchRow
    require(n > 0, s"sketchDeciles: no non-null values in $valueCol")

    case class Band(i: Int, p: Double, lo: Double, hi: Double,
                    est: Double, r: Long)
    val bands = tenths.sorted.map { i =>
      val p = i / 10.0
      Band(i, p,
        KllQuantileAgg.estimate(summary, math.max(0.0, p - delta)),
        KllQuantileAgg.estimate(summary, math.min(1.0, p + delta)),
        KllQuantileAgg.estimate(summary, p),
        math.max(1L, (i * n + 9L) / 10L))
    }

    // pass 2: exact ranks of proposals + below-band offsets, one scan
    val aggs = bands.flatMap { b =>
      Seq(sum(when(col("x") <= b.est, 1L).otherwise(0L))
            .as(s"rank_${b.i}"),
          sum(when(col("x") < b.lo, 1L).otherwise(0L))
            .as(s"off_${b.i}"))
    }
    val cert: Row = vals.agg(aggs.head, aggs.tail: _*).head()
    def lv(row: Row, name: String): Long =
      Option(row.getAs[Any](name)).fold(0L)(_.asInstanceOf[Long])

    val boundRows = bands.map { b =>
      val rank = lv(cert, s"rank_${b.i}")
      val off = lv(cert, s"off_${b.i}")
      // ε = 0.02 certified in integers: 5·|10·rank − i·n| ≤ n
      val ok = 5L * math.abs(10L * rank - b.i * n) <= n
      (b.i, b.p, b.lo, b.hi, b.r - off, ok)
    }
    val bounds = broadcast(boundRows
      .toDF("i", "p", "lo", "hi", "target_rn", "rank_ok"))

    // pass 3: exact selection inside the bands only
    val inband = vals.join(bounds,
      col("x") >= col("lo") && col("x") <= col("hi"))
    inband
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("i")).orderBy(col("x"))))
      .filter(col("rn") === col("target_rn"))
      .select(col("p"), col("x").as("exact_value"),
        lit(n).as("n"), col("rank_ok"))
      .orderBy(col("p"))
  }

  /** GROUPED exact deciles — the same propose→certify→select path as
    * [[sketchDeciles]] but per key, with NO driver-side state at all:
    * the per-group sketch summaries stay a DataFrame column, band
    * derivation is a map-side UDF over the finished summaries, and
    * every subsequent pass is a key-equi-join — so this scales to
    * millions of groups (the global variant's bounded driver collect
    * would not). Three shuffles total: the sketch aggregate, the
    * certify aggregate, the per-(group, decile) selection window.
    */
  def sketchDecilesByKey(df: DataFrame, keyCol: String, valueCol: String,
                         tenths: Seq[Int] = 1 to 9, k: Int = 1024,
                         delta: Double = 0.05): DataFrame = {
    require(tenths.nonEmpty && tenths.forall(i => i >= 1 && i <= 9),
      "tenths must be within 1..9")
    val spark = df.sparkSession
    val vals = CacheScope.cached(
      df.select(col(keyCol).as("g"),
        col(valueCol).cast("double").as("x"))
        .filter(col("x").isNotNull && col("g").isNotNull))

    val kll = new KllQuantileAgg(k).asUdaf
    val sketches = vals.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), kll(col("x")).as("s"))
    // band derivation: pure function of the finished summary — map-side
    val ts = tenths.sorted
    val bandsOf = udf { (summary: Seq[(Double, Long)], n: Long) =>
      ts.map { i =>
        val p = i / 10.0
        (i, p,
          KllQuantileAgg.estimate(summary, math.max(0.0, p - delta)),
          KllQuantileAgg.estimate(summary, math.min(1.0, p + delta)),
          KllQuantileAgg.estimate(summary, p),
          math.max(1L, (i * n + 9L) / 10L))
      }
    }
    val bands = CacheScope.cached(sketches
      .select(col("g"), col("n"),
        explode(bandsOf(col("s"), col("n"))).as("b"))
      .select(col("g"), col("n"), col("b._1").as("i"),
        col("b._2").as("p"), col("b._3").as("lo"), col("b._4").as("hi"),
        col("b._5").as("est"), col("b._6").as("r")))

    // certify + offsets: key-equi-join (×|tenths| row multiply), one agg
    val cert = vals.join(bands.select(col("g"), col("i"), col("lo"),
        col("est")), "g")
      .groupBy(col("g"), col("i"))
      .agg(sum(when(col("x") <= col("est"), 1L).otherwise(0L)).as("rank"),
        sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("off"))
    val certified = bands.join(cert, Seq("g", "i"))
      .select(col("g"), col("i"), col("p"), col("lo"), col("hi"),
        col("n"), (col("r") - col("off")).as("target_rn"),
        // ε = 0.02 in integers: 5·|10·rank − i·n| ≤ n
        (lit(5L) * abs(lit(10L) * col("rank") - col("i") * col("n"))
          <= col("n")).as("rank_ok"))

    // exact selection inside each (group, decile) band
    vals.join(certified,
        vals("g") === certified("g")
          && col("x") >= col("lo") && col("x") <= col("hi"))
      .drop(certified("g"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("i")).orderBy(col("x"))))
      .filter(col("rn") === col("target_rn"))
      .select(col("g").as(keyCol), col("p"),
        col("x").as("exact_value"), col("n"), col("rank_ok"))
      .orderBy(col(keyCol), col("p"))
  }
}
