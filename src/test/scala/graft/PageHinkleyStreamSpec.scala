package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Drift
import graft.streaming.PageHinkleyStream
import graft.streaming.PageHinkleyStream.SeriesObs

/** Streaming Page–Hinkley: four numbers of per-group state replay the
  * batch recursion bit-for-bit across micro-batch boundaries, and the
  * statistic actually alarms on a planted upward shift.
  */
class PageHinkleyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Lambda = 2000.0

  /** The events daily frame the registered query monitors, as exact
    * micros for the stream and DECIMAL(18,6) for the batch operator.
    */
  private def daily() = Tables.load(spark, sfDir, "events")
    .groupBy(col("event_type"), to_date(col("ts")).as("day"))
    .agg(sum(col("value").cast(DecimalType(18, 6)))
      .cast(DecimalType(18, 6)).as("y"))
    .select(col("event_type"),
      datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long").as("orderK"),
      col("y"))

  private def runStream(batches: Seq[Seq[SeriesObs]])
      : Seq[(String, Long, Long, Double, Boolean)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SeriesObs]
    val name = s"ph_${System.nanoTime()}"
    val q = PageHinkleyStream.pageHinkleyStream(mem.toDS(), Lambda)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[(String, Long, Long, Double, Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("stream PH series equals the batch operator bit-for-bit across batch splits") {
    val d = daily()
    val batch = Drift.pageHinkley(d, "event_type", "orderK", "y", Lambda)
      .select(col("event_type"), col("orderK"), col("i"),
        col("ph"), col("alarm"))
      .as[(String, Long, Long, Double, Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

    val obs = d.select(col("event_type").as("g"),
        col("orderK"), (col("y") * lit(1000000L)).cast("long").as("micros"))
      .as[SeriesObs].collect().toSeq.sortBy(_.orderK)
    // split mid-series so cross-batch state continuation is exercised
    val (b1, rest) = obs.splitAt(obs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    val streamed = runStream(Seq(b1, b2, b3))

    assert(streamed == batch,
      s"stream != batch\nstream head: ${streamed.take(3)}\n" +
        s"batch head:  ${batch.take(3)}")
    assert(batch.nonEmpty)
  }

  test("a planted sustained upward shift alarms; the flat prefix does not") {
    // 10 days at 1000, then 10 days at 1600: PH accumulates
    // (1600 - running mean) ≈ +300..+550 per shifted day
    val series = (1 to 10).map(d => SeriesObs("g", d.toLong, 1000L * 1000000L)) ++
      (11 to 20).map(d => SeriesObs("g", d.toLong, 1600L * 1000000L))
    val rows = runStream(Seq(series))
    val flat = rows.filter(_._2 <= 10)
    assert(flat.forall(!_._5), s"flat prefix must not alarm: $flat")
    assert(flat.forall(_._4 == 0.0),
      s"constant series has PH = 0 everywhere: $flat")
    val shifted = rows.filter(_._2 > 10)
    assert(shifted.last._5,
      s"sustained +60% shift must alarm by day 20: ${shifted.last}")
    // PH is monotone over the shifted suffix (mean lags the shift)
    val phs = shifted.map(_._4)
    assert(phs == phs.sorted, s"PH must grow through the shift: $phs")
  }
}
