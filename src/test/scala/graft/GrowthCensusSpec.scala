package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** GROWTH.md is the per-query sf0.01→sf0.1 amortization census
  * (VERDICT r11 #3) — the same staleness discipline as PLANS.md: a
  * census that stops at N−1 queries cannot trip, so every registered
  * query must carry a growth row. Regenerate with two full Bench runs
  * (SPARK_GRAFT_BENCH_NO_LOCAL=1 for the sf0.01 pass) and
  * `python3 tools/growth.py <sf001.json> <sf01.json>`.
  */
class GrowthCensusSpec extends AnyFunSuite {

  private val path = Paths.get("GROWTH.md")

  test("GROWTH.md census covers every registered query") {
    assert(Files.exists(path), "GROWTH.md missing — run tools/growth.py")
    val lines = Files.readAllLines(path).asScala
    val rows = lines
      .filter(l => l.startsWith("| ") && !l.startsWith("| query"))
      .map(_.stripPrefix("| ").takeWhile(_ != ' ')).toSet
    val declared = SparkEntry.queries.keySet
    val missing = declared -- rows
    val stale = rows -- declared
    assert(missing.isEmpty,
      s"GROWTH.md lacks rows for: ${missing.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"GROWTH.md has rows for unregistered queries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("GROWTH.md has no missing-measurement rows") {
    val missing = Files.readAllLines(path).asScala
      .filter(_.endsWith("| missing |"))
    assert(missing.isEmpty,
      s"rows without both SF measurements:\n${missing.mkString("\n")}")
  }
}
