package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Scalar-UDF exemplars (SURVEY.md §2-B "UDF surface").
  *
  * Policy: UDFs are the LAST resort — they're opaque to Catalyst (no
  * pushdown through them, no codegen fusion, boxing per row). Everything
  * in this engine that CAN be a built-in expression IS one; these exist to
  * cover the extension axis and as the pattern for logic that genuinely
  * needs arbitrary JVM code (e.g. a third-party tokenizer).
  */
object Udfs {

  /** Shannon entropy (bits/char) of a string — a quality-scoring signal
    * with no builtin equivalent (needs a per-row frequency map).
    */
  val charEntropy: UserDefinedFunction = udf { (s: String) =>
    if (s == null || s.isEmpty) 0.0
    else {
      val counts = new scala.collection.mutable.HashMap[Char, Int]()
      s.foreach(c => counts.update(c, counts.getOrElse(c, 0) + 1))
      val n = s.length.toDouble
      -counts.valuesIterator.map { c =>
        val p = c / n; p * math.log(p) / math.log(2)
      }.sum
    }
  }

  /** Deterministic 64-bit FNV-1a — exemplar of a custom hash a pipeline
    * might standardize on for cross-system compatibility.
    */
  val fnv1a64: UserDefinedFunction = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      var h = 0xcbf29ce484222325L
      var i = 0
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      java.lang.Long.valueOf(h)
    }
  }
}
