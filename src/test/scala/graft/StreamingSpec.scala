package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, window}
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.GraftFunctions
import graft.streaming.Streams
import graft.streaming.Streams.{SessionEvent, SessionOut}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming windowed counts aggregate by event-time window") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = Streams.windowedCounts(
        mem.toDF().toDF("ts", "k"), "ts", "10 minutes", "1 minute", Seq("k"))
      .writeStream.format("memory").queryName("win").outputMode("complete").start()
    mem.addData((ts(0), "a"), (ts(1), "a"), (ts(11), "a"), (ts(2), "b"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT k, n FROM win").as[(String, Long)].collect().toSet
    q.stop()
    assert(rows == Set(("a", 2L), ("a", 1L), ("b", 1L)))
  }

  test("append-mode windowed counts emit a window only after the watermark closes it") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = Streams.windowedCounts(
        mem.toDF().toDF("ts", "k"), "ts", "10 minutes", "1 minute", Seq("k"))
      .writeStream.format("memory").queryName("winap").outputMode("append").start()
    mem.addData((ts(0), "a"), (ts(1), "a"))
    q.processAllAvailable()
    // watermark hasn't passed the [0,10) window end — nothing emitted
    assert(spark.sql("SELECT * FROM winap").count() == 0)
    // an event at minute 30 advances the watermark to 29 > 10: the
    // first window closes and is emitted exactly once, final counts
    mem.addData((ts(30), "a"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT k, n FROM winap").as[(String, Long)].collect().toSet
    q.stop()
    assert(rows == Set(("a", 2L)))
  }

  test("streaming dedup drops repeated keys within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = Streams.dedupStream(
        mem.toDF().toDF("ts", "k"), "ts", "10 minutes", Seq("k"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    mem.addData((ts(0), "a"), (ts(0), "a"), (ts(0), "b"), (ts(1), "a"))
    q.processAllAvailable()
    val n = spark.sql("SELECT * FROM dd").count()
    q.stop()
    // (a, t0) duplicated exactly → 1 row; (b, t0) and (a, t1) distinct
    assert(n == 3)
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    implicit val sq = spark.sqlContext
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("dk", "label")
    val mem = MemoryStream[(Timestamp, String)]
    val q = Streams.enrichStream(
        mem.toDF().toDF("ts", "k"), dim, "k", "dk")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    mem.addData((ts(0), "a"), (ts(1), "c"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT k, label FROM enr")
      .as[(String, Option[String])].collect().toSet
    q.stop()
    // matched rows get the dim label; misses survive with null (left outer)
    assert(rows == Set(("a", Some("alpha")), ("c", None)))
  }

  test("kmv distinct sketch aggregates per event-time window on a stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val q = mem.toDF().toDF("ts", "uid")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(GraftFunctions.kmvDistinct(col("uid"), 64).as("du"))
      .writeStream.format("memory").queryName("kmvw")
      .outputMode("complete").start()
    // window 1: users {1, 2} (2 duplicated); window 2: user {3}
    mem.addData((ts(0), 1L), (ts(1), 2L), (ts(2), 2L), (ts(11), 3L))
    q.processAllAvailable()
    val rows = spark.sql("SELECT du FROM kmvw").as[Long].collect().sorted
    q.stop()
    assert(rows.toSeq == Seq(1L, 2L))
  }

  test("stream-stream interval join matches clicks within the window only") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val q = Streams.intervalJoin(
        imps.toDF().toDF("imp_ts", "ad"), "imp_ts", "ad",
        clicks.toDF().toDF("click_ts", "click_ad"), "click_ts", "click_ad",
        watermark = "1 minute", within = "10 minutes")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    imps.addData((ts(0), "a"), (ts(0), "b"))
    // a clicked at +5 (inside window), b clicked at +20 (outside),
    // c clicked with no impression at all
    clicks.addData((ts(5), "a"), (ts(20), "b"), (ts(5), "c"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT ad, click_ad FROM ij")
      .as[(String, String)].collect().toSet
    q.stop()
    assert(rows == Set(("a", "a")))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Streams.sessionize(mem.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    // user 1: events at minute 0, 5 (same session), then 30 (gap>10min →
    // first session closes with 2 events)
    mem.addData(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(5)))
    q.processAllAvailable()
    mem.addData(SessionEvent(1L, ts(30)))
    q.processAllAvailable()
    val closed = spark.sql("SELECT * FROM sess").as[SessionOut].collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.n_events == 2 && closed.head.closed)
  }
}
