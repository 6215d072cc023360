package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.WinnowStream
import graft.streaming.WinnowStream.DocIn

/** Streaming winnow-fingerprint near-dup gate: per-row fingerprints
  * bit-identical to the batch kernel, the ≥2-claimed-fingerprint
  * flag within and across micro-batches, and exact parity with the
  * batch arrival-order formulation on real corpus docs.
  */
class WinnowStreamSpec extends SparkSpec {
  import spark.implicits._

  private val run = (1 to 30).map(i => s"tok$i").mkString(" ")
  private val doc1 = s"aa bb cc dd ee ff gg hh $run zz yy xx wv"
  private val doc2 = s"mm nn oo pp qq rr ss tt $run uu vv ww kk" // shares the run
  private val far = (1 to 40).map(i => s"other$i word$i").mkString(" ")

  test("per-row fingerprint hashes match the batch column kernel bit-for-bit") {
    val docs = Seq((0L, doc1), (1L, doc2), (2L, far), (3L, "too short"))
      .toDF("doc_id", "text")
    val batch = docs.select(col("doc_id"),
        graft.ops.Text.winnowHashes(col("text"), 4, 8).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    Seq(0L -> doc1, 1L -> doc2, 2L -> far, 3L -> "too short").foreach {
      case (id, text) =>
        val local = graft.expressions.WinnowOps
          .selectHashes(text, 4, 8, xx = false).toSeq
        assert(local == batch(id), s"fingerprints diverge for doc $id")
    }
  }

  test("a doc sharing a long run with an earlier doc is flagged, within and across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = WinnowStream.winnowDedupStream(mem.toDS())
      .writeStream.format("memory").queryName("winnow_gate")
      .outputMode("complete").start()
    mem.addData(DocIn(10L, doc1), DocIn(30L, far))
    q.processAllAvailable()
    mem.addData(DocIn(20L, doc2)) // later batch, shares the 30-word run
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id, flagged FROM winnow_gate")
      .as[(Long, Int)].collect().toMap
    q.stop()
    assert(got(10L) == 0 && got(30L) == 0, "first-seen docs must not flag")
    assert(got(20L) == 1, "the shared 30-word run must flag the later doc")
  }

  test("single-batch stream equals the batch arrival-order formulation on corpus docs") {
    implicit val sq = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val expect = WinnowStream.winnowDedupBatch(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect().map { case (id, np, f) => id -> ((np, f)) }.toMap
    val mem = MemoryStream[DocIn]
    val q = WinnowStream.winnowDedupStream(mem.toDS())
      .writeStream.format("memory").queryName("winnow_parity")
      .outputMode("complete").start()
    mem.addData(docs.as[(Long, String)].collect().map(d => DocIn(d._1, d._2)).toIndexedSeq: _*)
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id, n_prior, flagged FROM winnow_parity")
      .as[(Long, Long, Int)].collect().map { case (id, np, f) => id -> ((np, f)) }.toMap
    q.stop()
    assert(got == expect, "stream vs batch arrival-order parity broke")
    assert(expect.values.exists(_._2 == 1), "corpus template dups should flag someone")
  }

  test("fingerprint claims survive checkpointed restart") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("winnow-src").toString
    val ckpt = Files.createTempDirectory("winnow-ckpt").toString
    val out = Files.createTempDirectory("winnow-out").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def js(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    def start() = WinnowStream.winnowVerdictStream(
        spark.readStream.schema(schema).json(src).as[DocIn])
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    Files.writeString(java.nio.file.Paths.get(s"$src/a.json"),
      js(10L, doc1) + "\n" + js(30L, far) + "\n")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    Files.writeString(java.nio.file.Paths.get(s"$src/b.json"),
      js(20L, doc2) + "\n")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val outSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("prior", IntegerType)))
    val rows = spark.read.schema(outSchema).json(out)
      .as[(Long, Int)].collect()
    // doc2 shares the 30-word run with phase-1's doc1: its prior=1
    // verdicts exist ONLY if doc1's fingerprint claims were restored
    // (a cold restart would see every doc2 fingerprint unclaimed)
    val doc2Prior = rows.filter(r => r._1 == 20L && r._2 == 1)
    assert(doc2Prior.length >= 2,
      s"restored claims missing: ${rows.toSeq.sortBy(_._1)}")
  }

  test("id-ordered micro-batch split preserves the verdicts") {
    implicit val sq = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(120)
      .as[(Long, String)].collect().sortBy(_._1).map(d => DocIn(d._1, d._2))
    val expect = WinnowStream.winnowDedupBatch(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Int)].collect().map { case (id, np, f) => id -> ((np, f)) }.toMap
    val mem = MemoryStream[DocIn]
    val q = WinnowStream.winnowDedupStream(mem.toDS())
      .writeStream.format("memory").queryName("winnow_split")
      .outputMode("complete").start()
    docs.grouped(40).foreach { g => mem.addData(g.toIndexedSeq: _*); q.processAllAvailable() }
    val got = spark.sql("SELECT doc_id, n_prior, flagged FROM winnow_split")
      .as[(Long, Long, Int)].collect().map { case (id, np, f) => id -> ((np, f)) }.toMap
    q.stop()
    assert(got == expect, "micro-batch split changed the verdicts")
  }
}
