package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Drift
import graft.streaming.PsiStream
import graft.streaming.PsiStream.Obs

/** Streaming PSI: O(bins) state, cross-batch accumulation, and
  * bit-identical parity of the merged stream report with the batch
  * Drift.psiReport when the stream is given the batch's bin edges.
  */
class PsiStreamSpec extends SparkSpec {
  import spark.implicits._

  test("merged stream PSI report equals the batch psiReport bit-for-bit") {
    val e = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("value"))
      .where(col("value").isNotNull && !isnan(col("value")))
    val ref = e.where(col("event_id") % 2 === 0)
    val cur = e.where(col("event_id") % 2 =!= 0)
    val batch = Drift.psiReport(ref, cur, "value", bins = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)

    // the batch report bins over the combined observed range; hand
    // the stream those edges so the two reports are comparable
    val (mn, mx) = e.agg(min(col("value")), max(col("value")))
      .as[(Double, Double)].head()
    val obs = ref.select(lit(0).as("side"), col("value").as("v"))
      .unionByName(cur.select(lit(1).as("side"), col("value").as("v")))
      .as[Obs].collect().toSeq

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = PsiStream.psiStream(mem.toDS(), mn, mx, bins = 10)
      .writeStream.format("memory").queryName("psi").outputMode("append")
      .start()
    val (b1, b2) = obs.splitAt(obs.size / 2)
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val latest = spark.sql(
      """SELECT bin, n_ref, n_cur FROM psi v
        |WHERE version = (SELECT max(version) FROM psi w
        |                 WHERE w.bin = v.bin)""".stripMargin)
      .as[(Long, Long, Long)].collect().toSeq
    q.stop()

    val streamed = PsiStream.psiTerms(latest)
    assert(streamed == batch,
      s"stream report != batch report\nstream: $streamed\nbatch:  $batch")
    // drift on this synthetic even/odd split should be near zero but
    // the report must still carry every bin
    assert(streamed.size == batch.size && batch.nonEmpty)
  }

  test("bin arithmetic clamps edges exactly like the batch expression") {
    assert(PsiStream.binOf(5.0, 5.0, 5.0, 10) == 0L) // degenerate range
    assert(PsiStream.binOf(0.0, 0.0, 1.0, 10) == 0L)
    assert(PsiStream.binOf(1.0, 0.0, 1.0, 10) == 9L) // max clamps to last
    assert(PsiStream.binOf(-3.0, 0.0, 1.0, 10) == 0L) // below range clamps
    assert(PsiStream.binOf(7.0, 0.0, 1.0, 10) == 9L) // above range clamps
  }
}
