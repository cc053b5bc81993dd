package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Z-order layout: the closed-form bucket id must equal the Morton
  * value's top bits, the box lookup must PHYSICALLY scan only the
  * surviving rectangles, and pruning must be sound (pruned answer ==
  * full-scan answer) including for clamped out-of-domain values.
  */
class ZIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def layout() = {
    val dir = Files.createTempDirectory("zidx").toString
    // grid covering all four quadrants of both dims, plus out-of-domain
    // values that clamp into the top cell
    val df = (0L until 2000L).map { i =>
      (i, (i * 37) % 5000, (i * 53) % 1000)
    }.toDF("id", "x", "y")
    ZIndex.writeZOrdered(df, dir, "x", "y", 4096L, 1024L)
    (dir, df)
  }

  test("bucket id == morton div 2^20 on the quantized dims") {
    val probe = spark.range(5000).select(
      (col("id") % 4096).as("xq"), (col("id") * 7 % 4096).as("yq"))
    val n = probe.withColumn("closed", ZIndex.bucket("xq", "yq"))
      .withColumn("viaZ",
        graft.ops.ZOrder.morton2(col("xq"), col("yq"), 12)
          .divide(lit(1048576L)).cast("long"))
      .filter(col("closed") =!= col("viaZ")).count()
    assert(n == 0)
  }

  test("box lookup scans only surviving rectangle dirs and matches " +
    "the full-scan answer") {
    val (dir, df) = layout()
    val (total, scanned, rows) =
      ZIndex.boxLookup(spark, dir, "x", "y", 100L, 899L, 200L, 399L)
    assert(total == 16)
    assert(scanned < total, "a selective box must prune something")
    // physical: the pruned read touches exactly `scanned` bucket dirs
    val touched = rows
      .select(expr("input_file_name()").as("f"))
      .select(regexp_extract(col("f"), "_zbucket=(\\d+)", 1).as("b"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(touched.size <= scanned.toInt)
    val expectRows = df.filter(col("x").between(100, 899)
      && col("y").between(200, 399))
    assert(rows.count() == expectRows.count())
    assert(rows.agg(sum("x")).head.getLong(0)
      == expectRows.agg(sum("x")).head.getLong(0))
    ()
  }

  test("clamped out-of-domain values stay findable (soundness does " +
    "not depend on the domain bound)") {
    val (dir, df) = layout()
    // x domain bound is 4096 but data reaches 4999 — clamped cells
    val (_, _, rows) =
      ZIndex.boxLookup(spark, dir, "x", "y", 4500L, 4999L, 0L, 2000L)
    val expect = df.filter(col("x") >= 4500 && col("x") <= 4999).count()
    assert(rows.count() == expect && expect > 0)
    ()
  }

  test("empty survivor set degrades to an empty frame with the layout " +
    "schema") {
    val (dir, _) = layout()
    val (_, scanned, rows) =
      ZIndex.boxLookup(spark, dir, "x", "y", 100000L, 200000L, 0L, 10L)
    assert(scanned == 0)
    assert(rows.count() == 0)
    assert(rows.columns.toSet == Set("id", "x", "y"))
    ()
  }
}
