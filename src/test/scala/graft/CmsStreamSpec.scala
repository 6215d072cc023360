package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.streaming.CmsStream
import graft.streaming.CmsStream.HashIn

/** Streaming Count–Min: bounded state, cross-batch accumulation, and
  * EXACT parity of the merged stream sketch with the batch count_min
  * aggregate over the same data.
  */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4
  private val Width = 16

  private def hashed(tokens: Seq[String]): Seq[Long] =
    tokens.toDF("t")
      .select(GraftFunctions.hash60(col("t").cast("string")).as("h"))
      .as[Long].collect().toSeq

  private def latestSketches(view: String): Seq[Seq[Long]] =
    spark.sql(
      s"""SELECT counters FROM $view v
         |WHERE version = (SELECT max(version) FROM $view w
         |                 WHERE w.grp = v.grp)""".stripMargin)
      .as[Seq[Long]].collect().toSeq

  test("merged stream sketch equals the batch count_min bit for bit") {
    val tokens = (1 to 400).map(i => s"tok${i % 37}")
    val batch = tokens.toDF("t")
      .agg(GraftFunctions.countMin(col("t"), Depth, Width).as("sk"))
      .as[Seq[Long]].head()

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[HashIn]
    val q = CmsStream.cmsStream(mem.toDS(), Depth, Width, groups = 4)
      .writeStream.format("memory").queryName("cms").outputMode("append")
      .start()
    val hs = hashed(tokens)
    val (h1, h2) = hs.splitAt(250)
    mem.addData(h1.map(HashIn): _*)
    q.processAllAvailable()
    mem.addData(h2.map(HashIn): _*)
    q.processAllAvailable()
    val merged = CmsStream.merge(latestSketches("cms"))
    q.stop()
    assert(merged.toSeq == batch.toSeq, "stream-merged sketch != batch sketch")

    // probe parity: estimates off the merged sketch match the batch
    // expression-side estimator for a present and an absent token
    Seq("tok5", "nope").foreach { t =>
      val h = hashed(Seq(t)).head
      val streamEst = CmsStream.estimate(merged, h, Depth, Width)
      val batchEst = tokens.toDF("t")
        .agg(GraftFunctions.countMin(col("t"), Depth, Width).as("sk"))
        .select(GraftFunctions.countMinEstimate(col("sk"),
          GraftFunctions.hash60(lit(t)), Depth, Width))
        .as[Long].head()
      assert(streamEst == batchEst, s"estimate parity broke for $t")
    }
  }

  test("state is one fixed counter array per group across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[HashIn]
    val q = CmsStream.cmsStream(mem.toDS(), Depth, Width, groups = 2)
      .writeStream.format("memory").queryName("cms2").outputMode("append")
      .start()
    mem.addData(hashed((1 to 50).map(i => s"a$i")).map(HashIn): _*)
    q.processAllAvailable()
    mem.addData(hashed((1 to 50).map(i => s"b$i")).map(HashIn): _*)
    q.processAllAvailable()
    val rows = latestSketches("cms2")
    q.stop()
    assert(rows.size <= 2 && rows.forall(_.length == Depth * Width))
    // total mass per row of the merged sketch = all 100 items
    val merged = CmsStream.merge(rows)
    (0 until Depth).foreach { j =>
      assert(merged.slice(j * Width, (j + 1) * Width).sum == 100L)
    }
  }
}
