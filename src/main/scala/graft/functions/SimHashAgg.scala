package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Typed `Aggregator[IN,BUF,OUT]` exemplar (SURVEY.md §7 step 8): 64-bit
  * SimHash over a group's tokens.
  *
  * One pass, fixed 64-int buffer, associative merge — the shape Spark's
  * partial aggregation needs: each partition folds its tokens locally and
  * only 64 ints per group cross the shuffle. Contrast with
  * graft.ops.Dedup.simhash (pure-DataFrame variant) which explodes 64 rows
  * per token; identical results (parity-tested), this one is the
  * at-scale form.
  *
  * Token hash = xxhash64(token, seed 42) — the exact function SQL
  * `xxhash64` uses, so the two implementations agree bit-for-bit.
  */
object SimHashAgg extends Aggregator[String, Array[Int], Long] {

  private def hashToken(tok: String): Long = {
    val u = UTF8String.fromString(tok)
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(u, org.apache.spark.sql.types.StringType, 42L)
  }

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tok: String): Array[Int] = {
    val h = hashToken(tok)
    var i = 0
    while (i < 64) {
      buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Column form for DataFrame use: `df.groupBy(..).agg(SimHashAgg.udaf(col))`. */
  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}
