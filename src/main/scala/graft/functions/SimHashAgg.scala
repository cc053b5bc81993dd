package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN,BUF,OUT]` exemplar (SURVEY.md §7 step 8): 63-bit
  * SimHash over a group's tokens.
  *
  * One pass, fixed 63-int buffer, associative merge — the shape Spark's
  * partial aggregation needs: each partition folds its tokens locally and
  * only 63 ints per group cross the shuffle. Contrast with
  * graft.ops.Dedup.simhash (pure-DataFrame variant) which explodes 63 rows
  * per token; identical results (parity-tested), this one is the
  * at-scale form.
  *
  * Token hash: bit b = bit (b mod 4) of hex digit (b div 4) of
  * md5(token) — the exact portable derivation Dedup.simhash's SQL plan
  * (and its DuckDB oracle) uses, so all three agree bit-for-bit.
  */
object SimHashAgg extends Aggregator[String, Array[Int], Long] {

  private val Bits = 63

  /** Portable 63-bit md5-derived token hash (see class scaladoc). */
  private def hashToken(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var out = 0L
    var b = 0
    while (b < Bits) {
      // hex digit (b/4) of the lowercase rendering: byte b/8, high nibble
      // for even digit index, low nibble for odd
      val digit =
        if (((b / 4) & 1) == 0) (d(b / 8) >>> 4) & 0xF
        else d(b / 8) & 0xF
      if (((digit >> (b % 4)) & 1) == 1) out |= (1L << b)
      b += 1
    }
    out
  }

  override def zero: Array[Int] = new Array[Int](Bits)

  override def reduce(buf: Array[Int], tok: String): Array[Int] = {
    val h = hashToken(tok)
    var i = 0
    while (i < Bits) {
      buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var i = 0
    while (i < Bits) {
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
