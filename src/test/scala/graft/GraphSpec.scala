package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Unit1 = 1000000000000L

  test("pageRank: symmetric cycle converges to equal ranks (mass conserved)") {
    // 4-cycle, both directions: perfectly symmetric, so every node
    // keeps exactly unit rank at every iteration (deg=2 division is
    // exact for the even unit)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val und = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(und, "src", "dst", iters = 5)
    val ranks = r.as[(Long, Long)].collect().toMap
    r.unpersist()
    assert(ranks.size == 4 && ranks.values.forall(_ == Unit1), s"$ranks")
  }

  test("pageRank: star center dominates the leaves") {
    val leaves = (2L to 11L)
    val und = (leaves.map(l => (1L, l)) ++ leaves.map(l => (l, 1L)))
      .toDF("src", "dst")
    val r = Graph.pageRank(und, "src", "dst", iters = 5)
    val ranks = r.as[(Long, Long)].collect().toMap
    r.unpersist()
    val center = ranks(1L)
    assert(leaves.forall(l => ranks(l) < center),
      s"center must outrank every leaf: $ranks")
    // every leaf is symmetric — identical ranks
    assert(leaves.map(ranks).toSet.size == 1)
  }

  test("triangleCount: known counts on K4, K4 minus an edge, and a path") {
    def tri(pairs: Seq[(Long, Long)]): Long = {
      val r = Graph.triangleCount(pairs.toDF("src", "dst"), "src", "dst")
      r.as[Long].head()
    }
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(k4) == 4)
    assert(tri(k4.filterNot(_ == ((3L, 4L)))) == 2)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0)
    // normalization: duplicated + reversed + self-loop edges collapse
    val messy = k4 ++ k4.map(_.swap) ++ Seq((1L, 1L), (2L, 3L))
    assert(tri(messy) == 4)
  }

  test("triangleCount: broadcast adj-intersect and shuffled wedge regimes agree") {
    // overlapping 8-cliques plus deterministic chords — nontrivial
    // count; force the shuffle fallback with broadcastMaxEdges = 0
    val cliques = for {
      b <- 0L until 20L; i <- 0L until 8L; j <- (i + 1) until 8L
    } yield (b * 6 + i, b * 6 + j)
    val chords = (1L to 500L).map(i => (i % 97, (i * 13) % 97))
    val edges = (cliques ++ chords).toDF("src", "dst")
    val fast = Graph.triangleCount(edges, "src", "dst").as[Long].head()
    val shuffled = Graph.triangleCount(edges, "src", "dst",
      broadcastMaxEdges = 0L).as[Long].head()
    assert(fast == shuffled, s"adj-intersect $fast != wedge $shuffled")
    assert(fast > 0)
  }

  test("pageRank is partitioning-independent (bit-identical fixed point)") {
    val edges = (1L to 400L).map(i => (i, (i * 7) % 97 + 1)).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, "src", "dst", iters = 4)
    val a = r1.as[(Long, Long)].collect().toSet
    r1.unpersist()
    val r2 = Graph.pageRank(edges.repartition(13), "src", "dst", iters = 4)
    val b = r2.as[(Long, Long)].collect().toSet
    r2.unpersist()
    assert(a == b)
  }
}
