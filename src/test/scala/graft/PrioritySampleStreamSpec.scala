package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.PrioritySampleStream

/** Streaming priority sample: exact parity with the batch
  * Efraimidis–Spirakis operator on the same rows, across micro-batch
  * boundaries and duplicate deliveries, with O(shards·k) state.
  */
class PrioritySampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 10
  private val Shards = 4

  private def runStream(batches: Seq[Seq[(Long, Double)]])
      : Seq[PrioritySampleStream.ShardSample] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = PrioritySampleStream.prioritySampleStream(
        mem.toDF().toDF("id", "weight"), K, Shards)
      .writeStream.format("memory").queryName("psample")
      .outputMode("update").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    // update-mode memory sink appends each emission; last row per
    // shard is the current state
    val rows = spark.sql("SELECT * FROM psample").collect()
    q.stop()
    rows.zipWithIndex
      .map { case (r, i) => (r.getInt(0), i, r.getSeq[org.apache.spark.sql.Row](1)
        .map(c => PrioritySampleStream.Cand(c.getLong(0), c.getDouble(1))))
      }
      .groupBy(_._1).map { case (shard, emits) =>
        PrioritySampleStream.ShardSample(shard, emits.maxBy(_._2)._3)
      }.toSeq
  }

  private def batchSample(rows: Seq[(Long, Double)]): Seq[Long] =
    graft.ops.Relational.prioritySample(
        rows.toDF("id", "weight").select(col("id"), col("weight")),
        K, col("weight"), col("id"))
      .select("id").as[Long].collect().toSeq.sorted

  test("streamed sample equals the batch operator on the same corpus") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val batches = rows.grouped(37).toSeq // uneven micro-batches
    val shards = runStream(batches)
    assert(shards.forall(_.cands.size <= K), "state cap violated")
    val streamed = PrioritySampleStream.globalTopK(shards, K).sorted
    assert(streamed == batchSample(rows))
  }

  test("duplicate deliveries across batches do not change the sample") {
    val rows = (1L to 120L).map(i => (i, 1.0 + (i % 5)))
    val withDups = Seq(rows.take(60), rows.slice(30, 90), rows.drop(60))
    val shards = runStream(withDups)
    val streamed = PrioritySampleStream.globalTopK(shards, K).sorted
    assert(streamed == batchSample(rows))
  }

  test("sample is invariant to micro-batch slicing") {
    val rows = (1L to 150L).map(i => (i, (i % 11 + 1).toDouble))
    val a = PrioritySampleStream.globalTopK(runStream(Seq(rows)), K)
    val b = PrioritySampleStream.globalTopK(
      runStream(rows.grouped(13).toSeq), K)
    assert(a == b)
  }
}
