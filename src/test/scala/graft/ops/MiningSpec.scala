package graft.ops

import graft.SparkTestBase
import scala.util.Random

class MiningSpec extends SparkTestBase {
  import spark.implicits._

  test("skyline2D matches brute-force dominance on random points") {
    val rnd = new Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(50).toDouble, rnd.nextInt(50)))
    val df = pts.zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val got = Mining.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val want = pts.zipWithIndex.collect {
      case ((x, y), i) if !pts.exists { case (qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y) } => i.toLong
    }.toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("skyline2D keeps tied frontier duplicates, drops null coords") {
    val df = Seq(
      (1L, Some(1.0), Some(5)), (2L, Some(1.0), Some(5)), // tied pair
      (3L, Some(2.0), Some(4)),                            // dominated
      (4L, Some(2.0), Some(9)),                            // frontier
      (5L, None, Some(9)), (6L, Some(0.5), None)           // incomparable
    ).toDF("id", "x", "y")
    val got = Mining.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L))
  }

  test("skyline3D matches brute-force dominance; partitioning-invariant") {
    val rnd = new Random(7)
    val pts = Seq.fill(400)((rnd.nextInt(20).toDouble,
      rnd.nextInt(20), rnd.nextInt(20).toDouble))
    val df = pts.zipWithIndex
      .map { case ((x, y, z), i) => (i.toLong, x, y, z) }
      .toDF("id", "x", "y", "z")
    val want = pts.zipWithIndex.collect {
      case ((x, y, z), i) if !pts.exists { case (qx, qy, qz) =>
        qx <= x && qy >= y && qz <= z &&
          (qx < x || qy > y || qz < z) } => i.toLong
    }.toSet
    Seq(1, 3, 7).foreach { np =>
      val got = Mining.skyline3D(df.repartition(np), "id",
          Seq(("x", true), ("y", false), ("z", true)))
        .select("id").as[Long].collect().toSet
      assert(got === want, s"partitions=$np")
    }
    assert(want.nonEmpty)
  }

  test("skylineND matches skyline3D on three dims for any partitioning") {
    val pts = (0 until 120).map { i =>
      ((i * 37) % 41, (i * 13) % 29, (i * 7) % 17)
    }
    val df = pts.zipWithIndex
      .map { case ((x, y, z), i) => (i.toLong, x, y, z) }
      .toDF("id", "x", "y", "z")
    val dims = Seq(("x", true), ("y", false), ("z", true))
    val want = Mining.skyline3D(df, "id", dims)
      .select("id").as[Long].collect().toSet
    Seq(1, 5, 11).foreach { np =>
      val got = Mining.skylineND(df.repartition(np), "id", dims)
        .select("id").as[Long].collect().toSet
      assert(got === want, s"partitions=$np")
    }
  }

  test("skylineND 4-D: brute-force agreement and ties all survive") {
    val pts = (0 until 90).map { i =>
      ((i * 37) % 23, (i * 13) % 19, (i * 7) % 11, (i * 5) % 13)
    } ++ Seq((0, 18, 0, 0), (0, 18, 0, 0)) // duplicate extreme vector
    val df = pts.zipWithIndex
      .map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
      .toDF("id", "a", "b", "c", "d")
    val want = pts.zipWithIndex.collect {
      case ((a, b, c, d), i) if !pts.exists { case (qa, qb, qc, qd) =>
        qa <= a && qb >= b && qc <= c && qd <= d &&
          (qa < a || qb > b || qc < c || qd > d) } => i.toLong
    }.toSet
    val got = Mining.skylineND(df.repartition(7), "id",
        Seq(("a", true), ("b", false), ("c", true), ("d", true)))
      .select("id").as[Long].collect().toSet
    assert(got === want)
    // both copies of the tied extreme vector survive
    assert(got.contains(90L) && got.contains(91L))
  }

  test("assocPairs: exact counts + integer lift on a hand example") {
    // baskets: {a,b,c}, {a,b}, {a,c}, {b} → n=4
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"), (4L, "b")) // dup collapses
    val out = Mining.assocPairs(rows.toDF("b", "i"), "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // lift(a,b) = 2·4·10⁶ / (3·3) = 888888 (floor)
    assert(out(("a", "b")) === ((2L, 3L, 3L, 4L, 888888L)))
    // lift(a,c) = 2·4·10⁶ / (3·2) = 1333333
    assert(out(("a", "c")) === ((2L, 3L, 2L, 4L, 1333333L)))
    assert(out(("b", "c")) === ((1L, 3L, 2L, 4L, 666666L)))
  }

  test("assocPairs minItemSupport prunes infrequent items before pairing") {
    val rows = Seq((1L, "a"), (1L, "z"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "b"))
    val out = Mining.assocPairs(rows.toDF("b", "i"), "b", "i",
      minItemSupport = 2L)
    val pairs = out.select("item_a", "item_b").as[(String, String)]
      .collect().toSet
    assert(pairs === Set(("a", "b"))) // "z" (support 1) never pairs
  }
  test("incremental ER equals from-scratch scoring on every " +
    "batch-touching pair (sf0.001 fixture)") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val full = graft.queries.MiningQueries.qErScore(spark, dir)
      .filter(col("id_b") >= 1000000L)
      .collect().map(_.toSeq).toSeq
    val inc = graft.queries.MiningQueries.qErIncremental(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty, "fixture must produce batch-touching pairs")
    assert(inc == full)
    // and the batch filter is the ONLY difference: no old×old pair
    // can appear in the incremental output
    assert(inc.forall(r => r(1).asInstanceOf[Long] >= 1000000L))
  }

}
