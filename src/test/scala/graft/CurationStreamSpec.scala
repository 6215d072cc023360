package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.CurationStream

/** Streaming curation-funnel parity: the stream's cumulative-stage
  * totals must equal the batch mirror on the same rows, including
  * exact duplicates that cross micro-batch boundaries (stage 5's
  * claim state is the only stateful piece).
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  // realistic-English passers (>= 20 words, stopword-bearing), plus
  // one per failure mode: short, repetitive, punctuation-noise
  private val good1 = "the quick brown fox jumps over the lazy dog while " +
    "the other animals watch from the shade of an old oak tree nearby today"
  private val good2 = "a long journey begins with a single step and the " +
    "travellers packed their bags with food and water before the sun rose " +
    "over the eastern hills"
  private val short1 = "too short to pass the length stage"
  private val repeat1 = ("spam " * 30).trim
  private val noisy1 = "!!! ??? *** " + ("#@! %^& " * 10) +
    "the end of a noisy fragment with twenty words somewhere in here to " +
    "pass length but not quality"

  private def runStream(batches: Seq[Seq[String]]): Array[Long] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val q = CurationStream.funnelStream(mem.toDF().toDF("text"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode("complete").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val row = spark.sql("SELECT * FROM funnel").head()
    q.stop()
    (0 until 12).map(row.getLong).toArray
  }

  test("streaming funnel equals the batch mirror, duplicates across batches") {
    val batch1 = Seq(good1, short1, good1, repeat1)
    val batch2 = Seq(good2, good1, noisy1, good2) // good1 dup crosses batches
    val streamed = runStream(Seq(batch1, batch2))
    val expected = CurationStream.funnelBatch(
      (batch1 ++ batch2).toDF("text")).head()
    val exp = (0 until 12).map(expected.getLong).toArray
    assert(streamed.toSeq == exp.toSeq)
    // and the funnel is structurally sane: anchored at the corpus,
    // monotone non-increasing, dedup stage collapses the three good1
    // and two good2 copies
    val n = streamed.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }
    assert(n(0) == 8L)
    assert(n.sliding(2).forall(p => p(1) <= p(0)))
    assert(n(5) < n(4)) // exact-unique stage dropped the duplicates
  }

  test("stage flags distinguish each engineered failure mode") {
    val flagged = Seq(good1, short1, repeat1)
      .toDF("text").select(CurationStream.flagCols(org.apache.spark.sql
        .functions.col("text")): _*)
      .collect().map(r => (r.getBoolean(2), r.getBoolean(3), r.getBoolean(5)))
    val Seq(g, s, rep) = flagged.toSeq
    assert(g._1 && g._2 && g._3) // good passes lang, length, diversity
    assert(!s._2)                // short fails length
    assert(!rep._3)              // repetitive fails diversity
  }

  test("streaming funnel in one batch equals the same rows in many batches") {
    val docs = Seq(good1, good2, short1, noisy1, good1, repeat1)
    val oneShot = runStream(Seq(docs))
    val perDoc = runStream(docs.map(Seq(_)))
    assert(oneShot.toSeq == perDoc.toSeq)
  }
}
