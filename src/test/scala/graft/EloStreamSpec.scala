package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EloStream
import graft.streaming.EloStream.{Match, Rating}

/** Streaming Elo: seq-ordered fold parity with the reference fold,
  * micro-batch slicing invariance, zero-sum conservation, versioned
  * uniqueness, and league isolation.
  */
class EloStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Match]]): Seq[Rating] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Match]
    val q = EloStream.eloStream(mem.toDS())
      .writeStream.format("memory").queryName("elost")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.sql("SELECT * FROM elost").as[Rating].collect().toSeq
    q.stop()
    rows
  }

  private def latest(rs: Seq[Rating]): Map[String, (Double, Long)] =
    rs.groupBy(_.player)
      .map { case (p, xs) =>
        val m = xs.maxBy(_.version); p -> (m.rating, m.games) }

  // deterministic pseudo-random tournament over 6 players
  private val matches = (0 until 120).map { i =>
    val a = s"p${i % 6}"
    val b = s"p${(i * 7 + 1) % 6}"
    val sa = Seq(0.0, 0.5, 1.0)((i * 13) % 3)
    Match("L", i.toLong, if (a == b) s"p${(i + 1) % 6}" else a, b, sa)
  }

  test("stream fold matches the reference fold in seq order") {
    val got = latest(runStream(matches.grouped(37).toSeq))
    val want = EloStream.fold(matches.sortBy(_.seq))
    assert(got.keySet == want.keySet)
    got.foreach { case (p, (r, g)) =>
      assert(r == want(p)._1, s"$p: $r vs ${want(p)._1}") // exact
      assert(g == want(p)._2)
    }
  }

  test("slicing-invariant: one batch vs many, identical final ratings") {
    val a = latest(runStream(Seq(matches)))
    val b = latest(runStream(matches.grouped(11).toSeq))
    assert(a == b)
  }

  test("ratings are zero-sum around the initial rating") {
    val fin = latest(runStream(Seq(matches)))
    val drift = fin.values.map(_._1 - EloStream.InitialRating).sum
    assert(math.abs(drift) < 1e-9, s"drift $drift")
  }

  test("(league, player, version) unique; leagues evolve independently") {
    val two = matches.take(40) ++
      matches.take(40).map(m => m.copy(league = "M"))
    val rows = runStream(two.grouped(23).toSeq)
    assert(rows.map(r => (r.league, r.player, r.version)).distinct.size
      == rows.size)
    val l = latest(rows.filter(_.league == "L"))
    val m = latest(rows.filter(_.league == "M"))
    assert(l == m) // same matches -> same ratings, no cross-league state
  }

  test("a win moves the winner up, the loser down, symmetric for upsets") {
    val one = runStream(Seq(Seq(Match("L", 0L, "a", "b", 1.0))))
    val r = latest(one)
    assert(r("a")._1 == 1016.0 && r("b")._1 == 984.0) // K/2 from equals
  }
}
