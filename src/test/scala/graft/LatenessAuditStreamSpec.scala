package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.LatenessAuditStream
import graft.streaming.LatenessAuditStream.ArrivalObs

/** Streaming lateness audit: O(1) state replays the batch
  * running-max recursion bit-for-bit across micro-batch splits, and
  * the counters move only on genuinely late rows.
  */
class LatenessAuditStreamSpec extends SparkSpec {
  import spark.implicits._

  /** The batch recursion over the events table — the same window
    * expressions as the `events_watermark_audit` aggregate half.
    */
  private def batchExpected(): Map[String, (Long, Long, Long, Long, Long)] = {
    val wArr = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("late_us", max(col("us")).over(wArr) - col("us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("late_us")).as("mx"),
        sum(when(col("late_us") > 60L * 1000000L, 1L).otherwise(0L)).as("c1m"),
        sum(when(col("late_us") > 600L * 1000000L, 1L).otherwise(0L)).as("c10m"),
        sum(when(col("late_us") > 3600L * 1000000L, 1L).otherwise(0L)).as("c1h"))
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("final stream report equals the batch running-max audit across batch splits") {
    val obs = Tables.load(spark, sfDir, "events")
      .select(col("event_type").as("g"), col("event_id").as("seq"),
        unix_micros(col("ts")).as("us"))
      .as[ArrivalObs].collect().toSeq.sortBy(_.seq)
    val (b1, rest) = obs.splitAt(obs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[ArrivalObs]
    val name = s"late_${System.nanoTime()}"
    val q = LatenessAuditStream.latenessAuditStream(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    val got = try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.sql(
        s"""SELECT g, n_events, max_late_us, c1m, c10m, c1h FROM $name v
           |WHERE version = (SELECT max(version) FROM $name w WHERE w.g = v.g)
           |""".stripMargin)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    } finally q.stop()

    val want = batchExpected()
    assert(got == want, s"stream != batch\nstream: $got\nbatch:  $want")
    assert(want.nonEmpty && want.values.forall(_._1 > 0))
  }

  test("counters move only on late rows; in-order delivery reports zero lateness") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[ArrivalObs]
    val name = s"late0_${System.nanoTime()}"
    val q = LatenessAuditStream.latenessAuditStream(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    val rows = try {
      // strictly increasing event time, then one row 2h late
      mem.addData((1 to 10).map(i =>
        ArrivalObs("g", i.toLong, i * 3600L * 1000000L)): _*)
      q.processAllAvailable()
      mem.addData(ArrivalObs("g", 11L, 8L * 3600L * 1000000L))
      q.processAllAvailable()
      spark.table(name)
        .orderBy(col("version"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    } finally q.stop()
    val first = rows.head
    assert(first._4 == 0L && first._5 == 0L, s"in-order batch must be clean: $first")
    val last = rows.last
    assert(last._4 == 2L * 3600L * 1000000L, s"2h regression: $last")
    assert(last._5 == 1L && last._6 == 1L && last._7 == 1L,
      s"one row late past every threshold: $last")
  }
}
