package graft.io

import java.nio.file.Files
import graft.SparkTestBase

class LakeIOSpec extends SparkTestBase {
  import spark.implicits._

  test("extensionOf: reference typing rule incl. 'unknown'") {
    assert(LakeIO.extensionOf("data.CSV") == "csv")
    assert(LakeIO.extensionOf("a/b/file.Parquet") == "parquet")
    assert(LakeIO.extensionOf("noext") == "unknown")
    assert(LakeIO.extensionOf(".hidden") == "unknown")
    assert(LakeIO.extensionOf("trailingdot.") == "unknown")
    assert(LakeIO.extensionOf("x.tar.gz") == "gz")
  }

  test("readAuto dispatches csv/json/text and binary fallback") {
    val dir = Files.createTempDirectory("lakeio").toFile
    val csv = new java.io.File(dir, "t.csv")
    Files.writeString(csv.toPath, "a,b\n1,x\n2,y\n")
    val json = new java.io.File(dir, "t.json")
    Files.writeString(json.toPath, """{"a":1}""" + "\n" + """{"a":2}""")
    val txt = new java.io.File(dir, "t.txt")
    Files.writeString(txt.toPath, "hello\nworld\n")
    val blob = new java.io.File(dir, "t.bin")
    Files.write(blob.toPath, Array[Byte](1, 2, 3))

    val c = LakeIO.readAuto(spark, csv.getPath)
    assert(c.columns.toSeq == Seq("a", "b") && c.count() == 2)
    assert(LakeIO.readAuto(spark, json.getPath).count() == 2)
    assert(LakeIO.readAuto(spark, txt.getPath).count() == 2)
    val b = LakeIO.readAuto(spark, blob.getPath)
    assert(b.columns.contains("content") && b.count() == 1)
  }

  test("writeAuto roundtrips csv and parquet") {
    val dir = Files.createTempDirectory("lakeio-w").toFile
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    LakeIO.writeAuto(df, s"$dir/out.csv")
    LakeIO.writeAuto(df, s"$dir/out.parquet")
    assert(LakeIO.readAuto(spark, s"$dir/out.csv").count() == 2)
    assert(LakeIO.readAuto(spark, s"$dir/out.parquet").count() == 2)
  }

  test("writeAuto roundtrips orc with values intact") {
    val dir = Files.createTempDirectory("lakeio-orc").toFile
    val df = Seq((1L, "x", 1.5), (2L, "y", -2.25)).toDF("id", "v", "d")
    LakeIO.writeAuto(df, s"$dir/out.orc")
    val back = LakeIO.readAuto(spark, s"$dir/out.orc")
      .orderBy($"id").as[(Long, String, Double)].collect().toSeq
    assert(back == Seq((1L, "x", 1.5), (2L, "y", -2.25)))
  }

  test("writeObserved: metrics ride the write job, no second scan") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("lakeio-obs").toFile
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("z")))
      .toDF("id", "v")
    // count jobs: piggybacked metrics must NOT re-read the source
    // (observe attaches CollectMetrics inside the write plan, so the
    // whole call is ONE job). Job-group membership is recorded by the
    // status tracker asynchronously — poll briefly before asserting.
    spark.sparkContext.setJobGroup("obs-test", "writeObserved spec")
    val m =
      try LakeIO.writeObserved(df, s"$dir/out.parquet", Seq(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null_v"),
        max(col("id")).as("max_id")))
      finally spark.sparkContext.clearJobGroup()
    assert(m("n_rows") == 3L && m("n_null_v") == 1L && m("max_id") == 3L)
    def jobs() = spark.sparkContext.statusTracker
      .getJobIdsForGroup("obs-test").length
    val deadline = System.nanoTime() + 5000000000L
    while (jobs() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(jobs() == 1, s"expected the write job only, saw ${jobs()} jobs")
    assert(LakeIO.readAuto(spark, s"$dir/out.parquet").count() == 3)
  }

  test("versioned publish: immutable pins, latest pointer, loud " +
      "missing-version, crashed staging cleared") {
    val dir = Files.createTempDirectory("lakeio-v").toFile
    val t = s"$dir/t"
    assert(LakeIO.writeVersioned(Seq((1L, "a")).toDF("id", "v"), t) == 1)
    assert(LakeIO.writeVersioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t) == 2)
    // pinned reads see their own snapshot; latest follows the head
    assert(LakeIO.readVersion(spark, t, Some(1)).count() == 1)
    assert(LakeIO.readVersion(spark, t, Some(2)).count() == 2)
    assert(LakeIO.readVersion(spark, t).count() == 2)
    // history carries (version, files, bytes)
    assert(LakeIO.versions(spark, t).map(_._1) == Seq(1, 2))
    // a leftover _staging from a crashed publish must not block or leak
    Files.createDirectories(new java.io.File(t, "_staging").toPath)
    assert(LakeIO.writeVersioned(
      Seq((3L, "c")).toDF("id", "v"), t) == 3)
    assert(LakeIO.readVersion(spark, t).count() == 1)
    // pinning a never-published version fails loudly, not empty
    intercept[java.util.NoSuchElementException] {
      LakeIO.readVersion(spark, t, Some(9))
    }
    intercept[java.util.NoSuchElementException] {
      LakeIO.readVersion(spark, s"$dir/nope")
    }
  }

  test("vacuumVersions: retention keeps the newest N, survivors still " +
    "readable, staging untouched, keep>=1 enforced") {
    val dir = Files.createTempDirectory("lakeio-vac").toFile
    val t = s"$dir/t"
    for (i <- 1 to 4)
      LakeIO.writeVersioned(
        (1L to i.toLong).map(x => (x, s"r$x")).toDF("id", "v"), t)
    // an in-flight publish must survive the vacuum
    Files.createDirectories(new java.io.File(t, "_staging").toPath)
    assert(LakeIO.vacuumVersions(spark, t, keep = 2) == Seq(1, 2))
    assert(LakeIO.versions(spark, t).map(_._1) == Seq(3, 4))
    assert(LakeIO.readVersion(spark, t, Some(3)).count() == 3)
    assert(LakeIO.readVersion(spark, t).count() == 4)
    assert(new java.io.File(t, "_staging").exists())
    intercept[java.util.NoSuchElementException] {
      LakeIO.readVersion(spark, t, Some(1))
    }
    // idempotent when nothing is collectable; current never deletable
    assert(LakeIO.vacuumVersions(spark, t, keep = 2).isEmpty)
    assert(LakeIO.vacuumVersions(spark, t, keep = 1) == Seq(3))
    assert(LakeIO.readVersion(spark, t).count() == 4)
    intercept[IllegalArgumentException] {
      LakeIO.vacuumVersions(spark, t, keep = 0)
    }
  }

  test("writeAuto partitionBy produces hive-style pruned layout") {
    val dir = Files.createTempDirectory("lakeio-p").toFile
    val df = Seq((1L, "en", "x"), (2L, "en", "y"), (3L, "de", "z"))
      .toDF("id", "lang", "v")
    LakeIO.writeAuto(df, s"$dir/out.parquet", partitionBy = Seq("lang"))
    assert(new java.io.File(s"$dir/out.parquet/lang=en").isDirectory)
    val back = spark.read.parquet(s"$dir/out.parquet")
    assert(back.count() == 3)
    // partition filter prunes to a single directory
    val plan = back.filter($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"))
  }

  test("schema evolution: mergeSchema unions parquet file schemas") {
    val dir = Files.createTempDirectory("lakeio-evo").toString
    // generation 1: (id, a); generation 2 adds column b
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/g=1")
    Seq((2L, "y", 9L)).toDF("id", "a", "b").write.parquet(s"$dir/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "g"))
    val rows = merged.select("id", "b").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(9L)))
  }

  test("listing applies the tenant prefix filter the reference disabled") {
    val dir = Files.createTempDirectory("lakeio-l").toFile
    Files.createDirectories(new java.io.File(dir, "u1").toPath)
    Files.createDirectories(new java.io.File(dir, "u2").toPath)
    Files.writeString(new java.io.File(dir, "u1/a.txt").toPath, "aaa")
    Files.writeString(new java.io.File(dir, "u2/b.txt").toPath, "bb")
    val all = LakeIO.listing(spark, dir.getPath)
    assert(all.count() == 2)
    val u1 = LakeIO.listing(spark, dir.getPath, prefix = "u1/")
      .select("name", "size").as[(String, Long)].collect()
    assert(u1.toSeq == Seq(("u1/a.txt", 3L)))
  }

  test("object-store surface end-to-end through s3a:// URIs (mock FS)") {
    // register the shim under the s3a scheme and run the configured-
    // session path: this is the closest a zero-egress env can get to an
    // object-store integration test (see S3CompatMockFs scaladoc)
    val conf = spark.sparkContext.hadoopConfiguration
    LakeIO.configureS3a(spark, "http://127.0.0.1:9000")
    assert(conf.get("fs.s3a.endpoint") == "http://127.0.0.1:9000")
    assert(conf.get("fs.s3a.path.style.access") == "true")
    assert(conf.get("fs.s3a.connection.ssl.enabled") == "false")
    conf.set("fs.s3a.impl", classOf[S3CompatMockFs].getName)
    // Spark wires scheme s3a to S3ACommitterFactory by default; that
    // class lives in hadoop-aws (absent here) — use the standard
    // FileOutputCommitter for the mock
    conf.set("mapreduce.outputcommitter.factory.scheme.s3a", "")
    try {
      val root = Files.createTempDirectory("s3mock").toString
      val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
        .toDF("id", "v")

      // write + read back through the non-file scheme
      LakeIO.writeAuto(df, s"s3a://$root/lake/docs.parquet")
      val back = LakeIO.readAuto(spark, s"s3a://$root/lake/docs.parquet")
      assert(back.orderBy($"id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))

      // csv dispatch through the same scheme
      LakeIO.writeAuto(df, s"s3a://$root/lake/docs.csv")
      assert(LakeIO.readAuto(spark, s"s3a://$root/lake/docs.csv")
        .count() == 3)

      // distributed listing with tenant prefix over s3a:// paths
      val names = LakeIO.listing(spark, s"s3a://$root/lake",
          prefix = "docs.parquet/")
        .select("name").as[String].collect().toSeq
      assert(names.nonEmpty &&
        names.forall(_.startsWith("docs.parquet/")))

      // compact (rename-aside swap) through the scheme's rename/delete
      LakeIO.compact(spark, s"s3a://$root/lake/docs.parquet", 1)
      val compacted = LakeIO.readAuto(spark,
        s"s3a://$root/lake/docs.parquet")
      assert(compacted.count() == 3)
      assert(compacted.inputFiles.length == 1 &&
        compacted.inputFiles.head.startsWith("s3a:/"))
    } finally {
      // evict ONLY the mock s3a instance from the FS cache (closeAll
      // would kill the session's live file:// filesystem too)
      val mock = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create("s3a:///"), conf)
      conf.unset("fs.s3a.impl")
      mock.close()
    }
  }
}
