package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Smooth
import graft.streaming.EwmaStream
import graft.streaming.EwmaStream.SeriesObs

/** Streaming EWMA: a ≤7-element ring of exact micros per group
  * replays the batch window expression bit-for-bit across micro-batch
  * boundaries and across a checkpointed restart.
  */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  /** The events daily frame the registered query smooths, keyed the
    * PageHinkleyStreamSpec way (epoch-day order key).
    */
  private def daily() = Tables.load(spark, sfDir, "events")
    .groupBy(col("event_type"), to_date(col("ts")).as("day"))
    .agg(round(sum(col("value").cast(DecimalType(18, 6)))
      .cast(DecimalType(18, 6)), 6).cast("double").as("y"))
    .select(col("event_type").as("g"),
      datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long").as("orderK"),
      col("y"))

  private def runStream(batches: Seq[Seq[SeriesObs]])
      : Seq[(String, Long, Double, Long, Double)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[SeriesObs]
    val name = s"ewma_${System.nanoTime()}"
    val q = EwmaStream.ewmaStream(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[(String, Long, Double, Long, Double)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("stream EWMA equals the batch operator bit-for-bit across " +
    "batch splits") {
    val d = daily()
    val batch = Smooth.ewmaAdjusted(d, "g", "orderK", "y")
      .as[(String, Long, Double, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    // micros via DECIMAL: double*1e6 truncates (513.91 → …9999)
    val obs = d.select(col("g"), col("orderK"),
        (col("y").cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")
          .as("micros"))
      .as[SeriesObs].collect().toSeq.sortBy(_.orderK)
    // split mid-series so the ring crosses micro-batch boundaries
    val (b1, rest) = obs.splitAt(obs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    val streamed = runStream(Seq(b1, b2, b3))
    assert(streamed == batch,
      s"stream != batch\nstream head: ${streamed.take(3)}\n" +
        s"batch head:  ${batch.take(3)}")
    assert(batch.nonEmpty)
  }

  test("a step change converges toward the new level at rate 1-beta") {
    // 10 days at 100, then 10 at 200: after the span cap fills with
    // post-shift values the EWMA sits within the truncated-tail gap
    // of 200; mid-shift values strictly increase
    val series = (1 to 10).map(d => SeriesObs("g", d.toLong, 100000000L)) ++
      (11 to 20).map(d => SeriesObs("g", d.toLong, 200000000L))
    val rows = runStream(Seq(series))
    val pre = rows.filter(_._2 <= 10)
    assert(pre.forall(_._5 == 100.0), s"flat prefix must smooth to 100: $pre")
    val post = rows.filter(_._2 > 10).map(_._5)
    assert(post == post.sorted && post.last > 195.0 && post.head < 150.0,
      s"shift must converge monotonically toward 200: $post")
    // first row has only itself in the window
    assert(rows.head._4 == 1L && rows.head._5 == rows.head._3)
  }

  test("the lag ring survives a checkpointed restart") {
    val src = Files.createTempDirectory("ewma-src").toString
    val ckpt = Files.createTempDirectory("ewma-ckpt").toString
    val out = Files.createTempDirectory("ewma-out").toString
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("orderK", LongType), StructField("micros", LongType)))
    def js(o: SeriesObs) =
      s"""{"g":"${o.g}","orderK":${o.orderK},"micros":${o.micros}}"""
    def write(name: String, obs: Seq[SeriesObs]): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$src/$name"),
        obs.map(js).mkString("", "\n", "\n"))
    def start() = EwmaStream.ewmaStream(
        spark.readStream.schema(schema).json(src).as[SeriesObs])
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val obs = (1 to 12).map(d =>
      SeriesObs("g", d.toLong, (d.toLong * 1000L) * 1000000L))
    write("a.json", obs.take(6))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    write("b.json", obs.drop(6))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val outSchema = StructType(Seq(StructField("g", StringType),
      StructField("orderK", LongType), StructField("y", DoubleType),
      StructField("n_lags", LongType), StructField("ewma", DoubleType)))
    val got = spark.read.schema(outSchema).json(out)
      .as[(String, Long, Double, Long, Double)]
      .collect().toSeq.sortBy(_._2)
    // row 7's window must include rows 1..6 from RESTORED state:
    // n_lags = 8 from day 8 on is reachable only with the phase-1 ring
    assert(got.map(_._2) == (1L to 12L), s"rows: $got")
    assert(got.filter(_._2 >= 8).forall(_._4 == 8L),
      s"post-restart windows must be full: $got")
    val batch = Smooth.ewmaAdjusted(
        obs.toDF("g", "orderK", "micros")
          .select(col("g"), col("orderK"),
            (col("micros").cast("double") / 1e6).as("y")),
        "g", "orderK", "y")
      .as[(String, Long, Double, Long, Double)]
      .collect().toSeq.sortBy(_._2)
    assert(got == batch, s"restart stream != batch:\n$got\nvs\n$batch")
  }
}
