package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern SUBSTRING scan — Aho & Corasick (CACM 1975).
  *
  * The word-level blocklist gate (q_text_blocklist) is a broadcast
  * membership test; SUBSTRING dictionaries can't be: naive scanning is
  * O(len · Σ|pattern|) per doc and regex alternation backtracks. The
  * AC automaton matches EVERY occurrence of EVERY pattern (including
  * occurrences overlapping each other and ending at the same
  * position, via output links folded through the fail chain) in ONE
  * O(len) pass per document, independent of dictionary size — the
  * standard engine for large substring blocklists / PII dictionaries
  * at corpus scale.
  *
  * Scale: the automaton builds once on the driver (O(Σ|pattern|)
  * nodes) and broadcasts; matching is a typed map over documents —
  * zero shuffle before the output aggregation.
  */
object TextScan {

  /** Immutable trie + fail links + per-node folded output lists. */
  final class Automaton private[TextScan] (
      children: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[List[Int]]) extends Serializable {

    /** Occurrence count per pattern index — ALL occurrences, however
      * they overlap. */
    def countAll(text: String, nPatterns: Int): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var cur = s
        while (cur != 0 && !children(cur).contains(c)) cur = fail(cur)
        s = children(cur).getOrElse(c, 0)
        var os = out(s)
        while (os.nonEmpty) { counts(os.head) += 1; os = os.tail }
        i += 1
      }
      counts
    }
  }

  object Automaton {
    def build(patterns: Seq[String]): Automaton = {
      require(patterns.nonEmpty && patterns.forall(_.nonEmpty))
      val children = mutable.ArrayBuffer(Map.empty[Char, Int])
      val out = mutable.ArrayBuffer(List.empty[Int])
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.foreach { c =>
          children(s).get(c) match {
            case Some(n) => s = n
            case None =>
              children += Map.empty[Char, Int]
              out += Nil
              val n = children.length - 1
              children(s) = children(s) + (c -> n)
              s = n
          }
        }
        out(s) = pi :: out(s)
      }
      val fail = Array.fill(children.length)(0)
      val queue = mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach(queue += _)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).foreach { case (c, v) =>
          queue += v
          var f = fail(u)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          val target = children(f).getOrElse(c, 0)
          fail(v) = if (target != v) target else 0
          // fold the fail node's outputs in (BFS order ⇒ already folded)
          out(v) = out(v) ++ out(fail(v))
        }
      }
      new Automaton(children.toArray, fail.toArray,
        out.map(_.sorted).toArray)
    }
  }

  /** (id, pattern, n) rows for every document × pattern with ≥ 1
    * occurrence. */
  def multiPatternCounts(docs: DataFrame, idCol: String,
      textCol: String, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ac = spark.sparkContext.broadcast(Automaton.build(patterns))
    val pats = patterns.toArray
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val cs = ac.value.countAll(t, pats.length)
        cs.iterator.zipWithIndex.collect {
          case (n, pi) if n > 0 => (id, pats(pi), n)
        }
      }
      .toDF(idCol, "pattern", "n")
  }
}
