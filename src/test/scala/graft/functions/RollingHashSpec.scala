package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the rolling k-gram hash family (RollingGramHashExpr) against an
  * independent direct evaluation: the expression computes each window
  * with an O(1) rolling update (drop-term · B^{k−1} subtraction); the
  * reference here recomputes every window with a plain left-fold. Any
  * error in the rolling algebra (modular subtraction, drop-power, pair
  * packing) diverges from the fold on random input.
  */
class RollingHashSpec extends SparkTestBase {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  /** Independent per-window fold (no rolling update). */
  private def direct(text: String, k: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    if (cps.length < k) Seq.empty
    else (0 to cps.length - k).map { p =>
      var h1 = 0L; var h2 = 0L
      (p until p + k).foreach { i =>
        h1 = (h1 * 131 + cps(i)) % 2147483647L
        h2 = (h2 * 131 + cps(i)) % 2147483629L
      }
      h1 * 2147483629L + h2
    }
  }

  private def engine(text: String, k: Int): Seq[Long] =
    Seq(Tuple1(text)).toDF("text")
      .select(expr(s"rolling_gram_hash(text, $k)").as("hs"))
      .as[Seq[Long]].head()

  private def forAll[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(7L + i)))
    }

  // mixed alphabet: ASCII, a multi-byte BMP char, and a supplementary
  // (surrogate-pair) char — positions must count CODE POINTS
  private val texts: Gen[String] = for {
    n <- Gen.chooseNum(0, 300)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', ' ', 'z', 'é', '世'))
  } yield cs.mkString + "😀" // one surrogate pair at the end

  test("rolling equals the direct per-window fold on random text") {
    forAll(texts) { t =>
      Seq(4, 8, 20).foreach { k =>
        assert(engine(t, k) == direct(t, k), s"k=$k text=${t.take(40)}")
      }
    }
  }

  test("surrogate pairs count as one position") {
    val t = "ab😀cd" // 5 code points, 6 UTF-16 units
    assert(engine(t, 5).size == 1)
    assert(engine(t, 5) == direct(t, 5))
  }

  test("shorter than k yields empty; null yields null") {
    assert(engine("abc", 4).isEmpty)
    val r = Seq(Tuple1(null: String)).toDF("text")
      .select(expr("rolling_gram_hash(text, 8)")).collect()
    assert(r.head.isNullAt(0))
  }

  test("interpreted eval agrees with codegen path") {
    // force the interpreted path via direct expression eval
    val e = RollingGramHashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("hello world hello"),
      org.apache.spark.sql.catalyst.expressions.Literal(8))
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(got == direct("hello world hello", 8))
  }

  test("collision resistance floor: all distinct 20-grams of a pangram-ish text hash distinctly") {
    val t = ("the quick brown fox jumps over the lazy dog " * 3) +
      "pack my box with five dozen liquor jugs"
    val hs = engine(t, 20)
    val grams = t.sliding(20).toSeq
    // distinct grams must map to distinct hashes on this tiny input
    assert(grams.distinct.size == hs.distinct.size)
  }
}
