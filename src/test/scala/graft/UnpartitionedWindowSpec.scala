package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanizes the bounded-window guarantee (VERDICT r15 #4/#5): every
  * `Window.orderBy` (unpartitioned window — WindowExec moves its whole
  * input to one task) site in src/main must be enumerated in
  * `src/test/resources/unpartitioned_windows.txt` with the contract
  * that bounds its input (value domains, partition counts, calendar
  * days — never data-sized rows). Any drift, in either direction,
  * fails: a NEW site must document its bound; a REMOVED site must drop
  * its allowlist row so the list can't rot.
  */
class UnpartitionedWindowSpec extends AnyFunSuite {

  private val srcRoot = java.nio.file.Paths.get("src/main/scala")

  private def codeSiteCounts: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(srcRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val n = java.nio.file.Files.readAllLines(p).asScala.count { l =>
          val t = l.trim
          t.contains("Window.orderBy") &&
            !t.startsWith("*") && !t.startsWith("//")
        }
        srcRoot.relativize(p).toString -> n
      }
      .filter(_._2 > 0).toMap
  }

  private def allowlist: Map[String, Int] = {
    val res = java.nio.file.Paths.get(
      "src/test/resources/unpartitioned_windows.txt")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(res).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split("\\|", 3)
        assert(parts.length == 3,
          s"allowlist line needs path|count|justification: $l")
        parts(0) -> parts(1).toInt
      }.toMap
  }

  test("every unpartitioned-window site is allowlisted with its bound") {
    val actual = codeSiteCounts
    val allowed = allowlist
    val undocumented = actual.filter { case (f, n) =>
      allowed.getOrElse(f, 0) < n }
    val rotted = allowed.filter { case (f, n) =>
      actual.getOrElse(f, 0) != n }
    assert(undocumented.isEmpty,
      "NEW unpartitioned-window site(s) — document the bounded-input " +
        s"contract in unpartitioned_windows.txt: $undocumented " +
        s"(allowed: ${undocumented.keys.map(allowed.getOrElse(_, 0))})")
    assert(rotted.isEmpty,
      "allowlist rot — counts no longer match src/main " +
        s"(file -> allowed vs actual): ${rotted.map { case (f, n) =>
          s"$f -> $n vs ${actual.getOrElse(f, 0)}" }}")
  }
}
