package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Data-skipping index: layout + sidecar correctness, pruning soundness
  * (pruned answers == full-scan answers), Bloom no-false-negative
  * guarantee, and the physical claim that a pruned lookup only READS the
  * surviving bucket directories. */
class SkippingSpec extends SparkTestBase {
  import spark.implicits._

  // 40 rows, keys 0..39, step 10 → buckets {0,1,2,3}; secondary column
  // sec = key % 7 spreads values across buckets deterministically.
  private lazy val table: String = {
    val dir = java.nio.file.Files.createTempDirectory("skipspec").toString
    val df = (0L until 40L).map(k => (k, k % 7, k.toDouble))
      .toDF("k", "sec", "v")
    Skipping.writeIndexed(df, dir, "k", "sec", 10L)
    dir
  }

  test("sidecar: one row per bucket, exact zone map") {
    val st = Skipping.stats(spark, table)
      .orderBy("bucket")
      .select("bucket", "min_key", "max_key", "n_rows")
      .as[(Long, Long, Long, Long)].collect()
    assert(st.toSeq == Seq((0L, 0L, 9L, 10L), (1L, 10L, 19L, 10L),
      (2L, 20L, 29L, 10L), (3L, 30L, 39L, 10L)))
  }

  test("range lookup: prunes to overlapping buckets, exact answer") {
    val (total, scanned, rows) =
      Skipping.lookupRange(spark, table, "k", 8L, 21L)
    assert(total == 4 && scanned == 3) // buckets 0,1,2 overlap [8,21]
    assert(rows.agg(count(lit(1)), sum("k")).as[(Long, Long)].collect()
      .head == ((14L, (8L to 21L).sum)))
  }

  test("range lookup: disjoint range scans nothing, keeps schema") {
    val (_, scanned, rows) =
      Skipping.lookupRange(spark, table, "k", 1000L, 2000L)
    assert(scanned == 0 && rows.count() == 0)
    assert(rows.columns.toSet == Set("k", "sec", "v"))
  }

  test("bloom: no false negative for any present value") {
    val st = Skipping.stats(spark, table)
      .select("bucket", "bloom").as[(Long, Seq[Long])].collect()
      .map { case (b, bl) => b -> bl.toArray }.toMap
    (0L until 40L).foreach { k =>
      assert(Skipping.bloomMightContain(st(k / 10), (k % 7).toString),
        s"false negative for sec=${k % 7} in bucket ${k / 10}")
    }
  }

  test("point lookup: present value == full-scan filter") {
    val (_, scanned, rows) = Skipping.lookupPoint(spark, table, "sec", 3L)
    assert(scanned >= 1 && scanned <= 4)
    // every bucket holds sec=3 (40 rows, %7 cycles through each decade)
    assert(rows.select("k").as[Long].collect().sorted.toSeq ==
      (0L until 40L).filter(_ % 7 == 3))
  }

  test("point lookup: absent value returns zero rows") {
    val (_, _, rows) = Skipping.lookupPoint(spark, table, "sec", 999L)
    assert(rows.count() == 0)
  }

  test("pruned read physically touches only surviving bucket dirs") {
    val (_, _, rows) = Skipping.lookupRange(spark, table, "k", 8L, 21L)
    val files = rows.select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => Seq("_bucket=0", "_bucket=1", "_bucket=2")
      .exists(f.contains)), files.mkString(","))
    assert(!files.exists(_.contains("_bucket=3")))
  }

  test("probePositions matches the relational md5 arithmetic") {
    val fromSql = spark.sql(
      """SELECT transform(sequence(0, 1), i ->
        |  (cast(conv(substring(md5('42'), 1, 15), 16, 10) as bigint)
        |   + i * (cast(conv(substring(md5('42'), 17, 15), 16, 10)
        |          as bigint) | 1)) % 16380)""".stripMargin)
      .collect().head.getSeq[Long](0).map(_.toInt)
    assert(Skipping.probePositions("42") == fromSql)
  }
}
