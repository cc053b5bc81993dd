package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev-only probe main; not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
    val k = 5; val t = 0.8
    val exploded = docs.select(col("doc_id").as("id"),
      explode(Dedup.shingles(col("text"), k)).as("s"))
    val dfTbl = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    println("distinct shingles: " + dfTbl.count())
    dfTbl.orderBy(col("df").desc).show(5)
    val sh = exploded.join(dfTbl, "s")
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("s")))),
        x => x.getField("s")).as("sh")).persist()
    val prefix = sh.select(col("id"),
      explode(slice(col("sh"), lit(1),
        (size(col("sh")) - ceil(size(col("sh")) * t) + 1).cast("int"))).as("s"))
    println("prefix rows: " + prefix.count())
    val cand = prefix.as("x").join(prefix.as("y"), col("x.s") === col("y.s"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    println("candidate pairs (with dup): " + cand.count())
    println("candidate pairs distinct: " + cand.distinct().count())
    spark.stop()
  }
}
