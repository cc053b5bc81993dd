package graft.ops

import graft.SparkTestBase

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

  test("observed: metrics collected during the action, no second pass") {
    val (out, obs) = Profile.observed(df, "t", "tag")
    out.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("n_null_keys") == 1L)
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
