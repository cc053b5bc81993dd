package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Everything here is built from Spark's codegen'd higher-order functions
  * (`zip_with`, `aggregate`, `transform`) — no UDFs — so the expressions
  * stay inside whole-stage codegen and scale linearly with row count.
  *
  * Numeric discipline: every element is cast to double BEFORE multiply and
  * the fold is a sequential left-to-right sum, making results reproducible
  * across engines/runs (same op order → same IEEE result); see
  * graft.queries.Exact.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with per-element double promotion, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (double). */
  def norm2(a: Column): Column = dot(a, a)

  /** ‖a‖₂. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns
    * null via division by zero → null? no: x/0.0 is null in Spark SQL).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane signature for cosine LSH: `nBits` sign bits packed
    * into a Long. Hyperplane h_j is a deterministic pseudo-random ±1 vector
    * derived from xxhash64(seed, j, i) — reproducible everywhere with no
    * stored model, so the same code runs on any executor at any scale.
    */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: Int): Column = {
    require(nBits <= 63, "signature packs into a Long")
    val bits = transform(sequence(lit(0), lit(nBits - 1)), j => {
      // projection_j = Σ_i sign(hash(seed,j,i)) * v_i  > 0
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) =>
          when(xxhash64(lit(seed), j, i) % 2 === 0, v.cast("double"))
            .otherwise(-v.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L)).otherwise(lit(0L))
    })
    // fold bits MSB-first: sig = Σ bit_j · 2^(n-1-j), built as acc*2+b
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }
}
