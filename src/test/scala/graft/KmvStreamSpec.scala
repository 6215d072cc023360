package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.streaming.KmvStream
import graft.streaming.KmvStream.HashIn

/** Streaming KMV distinct: bounded state, cross-batch accumulation,
  * and EXACT parity of the merged stream estimate with the batch
  * kmv_distinct aggregate over the same data.
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  /** hash60 of the tokens via the batch expression — the stream input
    * is pre-hashed exactly as the batch aggregate keys.
    */
  private def hashed(tokens: Seq[String]): Seq[Long] =
    tokens.toDF("t")
      .select(GraftFunctions.hash60(col("t").cast("string")).as("h"))
      .as[Long].collect().toSeq

  private def latestSketches(view: String): Seq[Long] =
    spark.sql(
      s"""SELECT hashes FROM $view v
         |WHERE version = (SELECT max(version) FROM $view w
         |                 WHERE w.grp = v.grp)""".stripMargin)
      .as[Seq[Long]].collect().flatten.toSeq

  test("merged stream estimate equals the batch kmv_distinct exactly") {
    val k = 16
    // 300 values, 120 distinct → past k, the estimator path (not the
    // exact-below-k path) is what parity exercises
    val tokens = (1 to 300).map(i => s"tok${i % 120}")
    val batch = tokens.toDF("t")
      .agg(GraftFunctions.kmvDistinct(col("t"), k).as("d"))
      .as[Long].head()

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[HashIn]
    val q = KmvStream.kmvStream(mem.toDS(), k, groups = 4)
      .writeStream.format("memory").queryName("kmv").outputMode("append")
      .start()
    val hs = hashed(tokens)
    val (h1, h2) = hs.splitAt(170)
    mem.addData(h1.map(HashIn): _*)
    q.processAllAvailable()
    mem.addData(h2.map(HashIn): _*)
    q.processAllAvailable()
    val merged = KmvStream.estimate(latestSketches("kmv"), k)
    q.stop()
    assert(merged == batch, s"stream $merged != batch $batch")
  }

  test("state stays bounded at k per group and is exact below k") {
    val k = 32
    val tokens = (1 to 10).map(i => s"only$i") // 10 distinct < k
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[HashIn]
    val q = KmvStream.kmvStream(mem.toDS(), k, groups = 2)
      .writeStream.format("memory").queryName("kmv2").outputMode("append")
      .start()
    mem.addData(hashed(tokens ++ tokens).map(HashIn): _*) // dups collapse
    q.processAllAvailable()
    val sketches = latestSketches("kmv2")
    q.stop()
    assert(sketches.size == 10, s"distinct hashes lost or duplicated: $sketches")
    assert(KmvStream.estimate(sketches, k) == 10L)
    assert(sketches.distinct.size == sketches.size)
  }
}
