package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Weighted geometric mean — the typed-Aggregator exemplar named in
  * SURVEY.md §2-B: exp(Σ wᵢ·ln xᵢ / Σ wᵢ).
  *
  * Buffer = (Σ w·ln x, Σ w): constant-size, associative merge → Spark
  * plans it as partial+final aggregation (only two doubles per group
  * cross the shuffle). Non-positive x contributes nothing (ln undefined);
  * empty/zero-weight groups yield null.
  */
object WeightedGeoMeanAgg
    extends Aggregator[(Double, Double), (Double, Double), java.lang.Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double),
                      in: (Double, Double)): (Double, Double) = {
    val (x, w) = in
    if (x > 0.0 && w > 0.0) (b._1 + w * math.log(x), b._2 + w) else b
  }

  override def merge(a: (Double, Double),
                     b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): java.lang.Double =
    if (b._2 == 0.0) null else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Double)] =
    ExpressionEncoder[(Double, Double)]()
  override def outputEncoder: Encoder[java.lang.Double] =
    Encoders.DOUBLE

  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}
