package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign each document
  * to a fixed-capacity context-window bin by cumulative token count —
  * the layout step before concatenating documents into model context
  * windows.
  *
  * Deterministic and scalable by construction: documents first scatter
  * into `buckets` independent streams by id-hash (md5-derived, so the
  * DuckDB oracle reproduces it), then pack contiguously WITHIN a bucket
  * in (id-hash, id) order — `bin = floor((running_sum − own_tokens) /
  * capacity)`, i.e. a document lands in the bin where its first token
  * would fall in a contiguous layout (documents longer than `capacity`
  * span bins but are assigned to their start bin). The window partitions
  * by bucket, so parallelism = `buckets` and no global ordering exists
  * anywhere; at 100 TB you size `buckets` ≈ cluster cores and each
  * bucket's running sum is one ordered partition scan.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    capacity: Long, buckets: Int): DataFrame = {
    val bucket = floor(Sampling.hashUniform(col(idCol)) * buckets)
      .cast("long")
    val w = Window.partitionBy(col("_bucket"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_bucket", bucket)
      .withColumn("_cum", sum(col(tokenCol)).over(w))
      .select(col(idCol), col("_bucket").as("bucket"),
        expr(s"(_cum - $tokenCol) div $capacity").as("bin"),
        col(tokenCol))
  }
}
