package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, lit}

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  lazy val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, None, 20.0),
    (3L, Some("a"), 30.0)
  ).toDF("id", "tag", "v")

  test("profile: one-pass per-column stats") {
    val p = Profile.profile(df)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(p("id") == (("id", 3L, 0L, 3L, "1", "3")))
    val tag = p("tag")
    assert(tag._2 == 3 && tag._3 == 1) // one null
    assert(tag._5 == "a" && tag._6 == "a")
  }

  test("exactProfile: stacked exact stats match hand counts") {
    val p = Profile.exactProfile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(p("id")._4 == 3)            // distinct ids
    assert(p("tag")._3 == 1)           // one null
    assert(p("tag")._4 == 1)           // countDistinct skips nulls
  }

  test("inclusion: containment ppm over distinct child values") {
    import spark.implicits._
    val child = Seq(1L, 1L, 2L, 3L, 4L).toDF("fk") // distinct {1,2,3,4}
    val parent = Seq(1L, 2L, 9L).toDF("pk")
    val r = Profile.inclusion("t", child, "fk", parent, "pk")
      .collect().head
    assert(r.getString(0) == "t")
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 500000L) // 2/4 in exact ppm
    // full containment is exactly 10^6
    val full = Profile.inclusion("f", parent, "pk",
      Seq(1L, 2L, 9L, 10L).toDF("pk"), "pk").collect().head
    assert(full.getLong(3) == 1000000L)
  }

  test("observed: metrics collected during the action, no second pass") {
    val (out, obs) = Profile.observed(df, "t", "tag")
    out.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("n_null_keys") == 1L)
  }

  test("keySkew: heaviest key first, ratio vs mean rows-per-key") {
    val keys = Seq.fill(4)("a") ++ Seq("b", "c") // mean = 6/3 = 2
    val out = CacheScope.scoped {
      Profile.keySkew(keys.toDF("k"), "k", k = 2)
        .as[(String, Long, Double)].collect().toSeq
    }
    assert(out.head == (("a", 4L, 2.0)))
    assert(out.size == 2)
  }

  test("quarantine: malformed rows flagged, null input is NOT quarantined") {
    val df = Seq(
      (1L, """{"k": 7}"""), (2L, """{oops"""), (3L, null: String))
      .toDF("id", "js")
    val out = graft.io.LakeIO.parseWithQuarantine(df, "js",
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
      .select($"id", $"_quarantined", $"parsed.k")
      .as[(Long, Boolean, Option[Int])].collect().toMap2
    assert(out(1L) == ((false, Some(7))))
    assert(out(2L) == ((true, None)))
    assert(out(3L) == ((false, None))) // absent ≠ malformed
  }

  test("morton2 interleaves bits; clusterByZ preserves rows, sorts by _z") {
    val z = spark.range(1).select(
      ZOrder.morton2(lit(3L), lit(5L), 8).as("z")).head().getLong(0)
    // x=3 → bits 0,1 at even slots (1+4); y=5 → bits 0,2 at odd (2+32)
    assert(z == 39L)
    val df = Seq((3L, 1L), (0L, 0L), (255L, 255L), (1L, 2L))
      .toDF("x", "y")
    val clustered = ZOrder.clusterByZ(df, "x", "y", bits = 8,
      partitions = 2)
    assert(clustered.count() == 4)
    val zs = clustered.select($"_z").as[Long].collect()
    assert(zs.max == 65535L) // (255, 255) → all 16 interleaved bits set
  }

  test("z-ordered layout skips row groups under a 2-D box predicate; " +
    "linear layout reads everything") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    // rows the parquet reader actually emitted (post row-group pruning)
    def scanRows(df: DataFrame): Long = {
      df.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case other => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }

    // full 256×256 grid: every (x, y) cell exactly once
    val grid = spark.range(65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zskip").toString

    // same data, same file count — only the LAYOUT differs
    grid.repartition(16).write.parquet(s"$dir/linear")
    ZOrder.clusterByZ(grid, "x", "y", bits = 8, partitions = 16)
      .drop("_z").write.parquet(s"$dir/zorder")

    def box(path: String): DataFrame =
      spark.read.parquet(path).filter(col("x") < 32 && col("y") < 32)

    assert(box(s"$dir/linear").count() == 1024L)
    assert(box(s"$dir/zorder").count() == 1024L)

    val linRows = scanRows(box(s"$dir/linear"))
    val zRows = scanRows(box(s"$dir/zorder"))
    // round-robin files all span the full x/y range → min/max stats
    // prune nothing; morton-banded files are small boxes → the reader
    // skips all but the band(s) overlapping [0,32)²
    assert(linRows == 65536L,
      s"linear layout should read every row group, read $linRows")
    assert(zRows <= linRows / 4,
      s"z-order should skip most row groups: read $zRows of $linRows")
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("compact: rewrites to the target file count, preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val path = s"$dir/data.parquet"
    spark.range(1000).repartition(20).write.parquet(path)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) == 20)
    graft.io.LakeIO.compact(spark, path, 2)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    assert(spark.read.parquet(path).count() == 1000)
  }
}
