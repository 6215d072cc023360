package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.{MinHashLocal, MinHashStream}
import graft.streaming.MinHashStream.DocIn

/** Streaming MinHash-LSH dedup (ST1 strict parity): per-row signature
  * math must be bit-identical to the batch expression pipeline, and
  * the bucket-keyed state must drop collisions within AND across
  * micro-batches (the reference's sequential first-seen-wins index,
  * etl_slimpajama_dc_proc.py:119-166).
  */
class MinHashStreamSpec extends SparkSpec {
  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog in the garden today"
  private val near2 = "the quick brown fox jumps over the lazy dog in the garden now"
  private val far = "completely different content about spark query engines and shuffles here"

  test("per-row signature math matches the batch expression pipeline bit-for-bit") {
    val docs = Seq((0L, near1), (1L, near2), (2L, far), (3L, "too short"))
      .toDF("doc_id", "text")
    val batch = Similarity.minhashSignatures(docs, "doc_id", "text", 64, 5)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(i => r.getLong(i))).toMap
    assert(batch.keySet == Set(0L, 1L, 2L), "short doc must have no batch signature")
    for (id <- Seq(0L, 1L, 2L)) {
      val text = Seq(near1, near2, far)(id.toInt)
      val local = MinHashLocal.signature(text, 64, 5).get.toSeq
      assert(local == batch(id), s"signature mismatch for doc $id")
    }
    assert(MinHashLocal.signature("too short", 64, 5).isEmpty)
  }

  test("streaming corpus pipeline composes: clean -> quality filter -> LSH dedup") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocIn]
    // the batch text operators apply unchanged to a streaming frame;
    // dedup verdicts come from the stateful bucket operator
    val cleaned = mem.toDS()
      .withColumn("text", graft.ops.Text.cleanText(col("text")))
      .where(length(col("text")) > 20)
      .as[DocIn]
    val q = MinHashStream.minhashDedupStream(cleaned)
      .writeStream.format("memory").queryName("pipe_dedup")
      .outputMode("complete").start()
    mem.addData(
      DocIn(1L, s"  see https://spam.example  $near1  "),
      DocIn(2L, near1),             // near-dup of 1 after cleanup
      DocIn(3L, "too short"),       // filtered out before dedup
      DocIn(4L, far))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id, dropped FROM pipe_dedup")
      .as[(Long, Boolean)].collect().toMap
    q.stop()
    assert(got.keySet == Set(1L, 2L, 4L), "short doc must be filtered upstream")
    assert(!got(1L) && got(2L) && !got(4L))
  }

  test("streaming dedup drops bucket collisions within and across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = MinHashStream.minhashDedupStream(mem.toDS())
      .writeStream.format("memory").queryName("mhdedup")
      .outputMode("complete").start()

    // batch 1: 0 and 1 are near-dups (share buckets) → 1 dropped;
    // 2 is far → survives; 3 has no signature → survives
    mem.addData(DocIn(0L, near1), DocIn(1L, near2), DocIn(2L, far),
      DocIn(3L, "too short"))
    q.processAllAvailable()
    val after1 = spark.sql("SELECT doc_id, dropped FROM mhdedup")
      .as[(Long, Boolean)].collect().toMap
    assert(after1 == Map(0L -> false, 1L -> true, 2L -> false, 3L -> false))

    // batch 2: 10 duplicates doc 0 → dropped via state from batch 1
    // (cross-batch); 11 is new → survives
    mem.addData(DocIn(10L, near1),
      DocIn(11L, "some entirely fresh sentence with enough words to shingle properly"))
    q.processAllAvailable()
    val after2 = spark.sql("SELECT doc_id, dropped FROM mhdedup")
      .as[(Long, Boolean)].collect().toMap
    q.stop()
    assert(after2(10L), "cross-batch duplicate must be dropped by bucket state")
    assert(!after2(11L))

    // single-batch verdicts match the batch window rule (lowest id wins)
    val batchDropped = Similarity.lshDroppedIds(
        Similarity.minhashSignatures(
          Seq((0L, near1), (1L, near2), (2L, far)).toDF("doc_id", "text"),
          "doc_id", "text", 64, 5), "doc_id", 16, 4)
      .as[Long].collect().toSet
    assert(batchDropped == after1.filter(_._2).keySet)
  }

  test("stateTtl: claims persist across batches within the ttl and expire after it") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocIn]
    // generous TTL: the within-ttl batch (state-store init + polls)
    // must comfortably land inside it even on a loaded machine
    val ttl = java.time.Duration.ofMillis(8000)
    // With ProcessingTimeTimeout the query triggers batches
    // back-to-back to service timeouts, so processAllAvailable()'s
    // no-new-data latch never fires — poll the sink instead.
    val q = MinHashStream.minhashDedupStream(mem.toDS(), stateTtl = Some(ttl))
      .writeStream.format("memory").queryName("mhdedup_ttl")
      .outputMode("complete").start()
    def verdicts(): Map[Long, Boolean] =
      spark.sql("SELECT doc_id, dropped FROM mhdedup_ttl")
        .as[(Long, Boolean)].collect().toMap
    def awaitDoc(id: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!verdicts().contains(id) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(verdicts().contains(id), s"doc $id never reached the sink")
    }

    // batch 1: claim the near1 buckets
    mem.addData(DocIn(0L, near1), DocIn(1L, far))
    awaitDoc(0L); awaitDoc(1L)
    assert(verdicts() == Map(0L -> false, 1L -> false))

    // batch 2 (well inside the ttl): duplicate still dropped
    mem.addData(DocIn(10L, near1))
    awaitDoc(10L)
    assert(verdicts()(10L), "within-ttl duplicate must be dropped")

    // wait past the ttl: the continuously-running batches fire the
    // timeout callback and remove the claim, so a re-arriving
    // duplicate is first-seen again
    Thread.sleep(ttl.toMillis + 3000)
    mem.addData(DocIn(21L, near1))
    awaitDoc(21L)
    val fin = verdicts()
    q.stop()
    assert(!fin(21L),
      "post-ttl duplicate must be first-seen again (claim expired)")
  }
}
