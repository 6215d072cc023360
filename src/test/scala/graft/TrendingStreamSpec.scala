package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TrendingStream
import graft.streaming.TrendingStream.{EventIn, WindowTop}

/** Windowed streaming trending top-k: exact parity with the batch
  * per-window ranking when capacity covers the type universe, MG
  * retention guarantee below it, bounded per-window state.
  */
class TrendingStreamSpec extends SparkSpec {
  import spark.implicits._

  private val WindowMs = 60000L // 1-minute windows for the test

  private def ts(window: Int, offset: Int) =
    new Timestamp(1700000000000L - 1700000000000L % WindowMs +
      window * WindowMs + offset)

  private def runStream(batches: Seq[Seq[EventIn]], capacity: Int)
      : Seq[WindowTop] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventIn]
    val q = TrendingStream.trendingStream(mem.toDS(), WindowMs, capacity)
      .writeStream.format("memory").queryName("trend")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.sql("SELECT * FROM trend").as[WindowTop].collect().toSeq
    q.stop()
    rows
  }

  test("windowed top-k equals the exact batch ranking when capacity covers " +
    "the types, across micro-batches") {
    val w0 = Seq("click", "click", "click", "view", "view", "buy")
      .zipWithIndex.map { case (t, i) => EventIn(ts(0, i), t) }
    val w1 = Seq("view", "view", "view", "click", "buy", "buy")
      .zipWithIndex.map { case (t, i) => EventIn(ts(1, i), t) }
    // split so both windows receive events in both micro-batches
    val batches = Seq(w0.take(3) ++ w1.take(2), w0.drop(3) ++ w1.drop(2))
    val out = TrendingStream.currentTopK(runStream(batches, capacity = 8), 2)
    val expected = (w0 ++ w1).groupBy(e =>
        new Timestamp(e.ts.getTime - e.ts.getTime % WindowMs))
      .map { case (w, es) =>
        w -> es.groupBy(_.event_type).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (t, c) => (-c, t) }.take(2)
      }
    assert(out == expected)
    assert(out.size == 2)
  }

  test("below-capacity MG state retains the dominant type with bounded " +
    "undercount") {
    val n = 300
    // one dominant type (half the stream) + many rare types
    val events = (0 until n).map { i =>
      val t = if (i % 2 == 0) "hot" else s"rare${i % 37}"
      EventIn(ts(0, i % 50000), t)
    }
    val rows = runStream(events.grouped(97).toSeq, capacity = 4)
    val top = TrendingStream.currentTopK(rows, 1)
    assert(top.size == 1)
    val (tName, tCount) = top.head._2.head
    assert(tName == "hot", s"dominant type evicted: ${top.head._2}")
    // MG undercount bound: true 150, underestimate <= seen/capacity
    assert(tCount >= n / 2 - n / 4 && tCount <= n / 2)
    // per-window candidate set bounded by capacity
    val latest = rows.map(_.version).max
    assert(rows.count(_.version == latest) <= 4)
  }
}
