package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.HeavyHittersStream
import graft.streaming.HeavyHittersStream.TokenIn

/** Streaming Misra–Gries heavy hitters: bounded per-group state, the
  * MG superset guarantee across micro-batches, and parity of the
  * offer step with the batch frequent_items sketch.
  */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  private def currentCandidates(view: String): Map[Int, Set[String]] = {
    val rows = spark.sql(
      s"""SELECT grp, token FROM $view v
         |WHERE version = (SELECT max(version) FROM $view w
         |                 WHERE w.grp = v.grp)""".stripMargin)
      .as[(Int, String)].collect()
    rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
  }

  test("heavy token survives across micro-batches, state stays bounded") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[TokenIn]
    val q = HeavyHittersStream
      .heavyHittersStream(mem.toDS(), capacity = 2, groups = 1)
      .writeStream.format("memory").queryName("hh").outputMode("append")
      .start()
    // batch 1: a=6 b=2 c=1; batch 2: a=4 d=2 → n=15, bound n/3=5,
    // only "a" (10) clears it — and only via cross-batch accumulation
    mem.addData(Seq.fill(6)(TokenIn("a")) ++ Seq.fill(2)(TokenIn("b"))
      ++ Seq(TokenIn("c")): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(4)(TokenIn("a")) ++ Seq.fill(2)(TokenIn("d")): _*)
    q.processAllAvailable()
    val cands = currentCandidates("hh")
    q.stop()
    assert(cands.keySet == Set(0))
    assert(cands(0).contains("a"), s"heavy token missing from $cands")
    assert(cands(0).size <= 2, s"state exceeded capacity: $cands")
    // versions are the group's monotone token tally: 9 then 15
    val versions = spark.sql("SELECT DISTINCT version FROM hh")
      .as[Long].collect().toSet
    assert(versions == Set(9L, 15L))
  }

  test("multi-group partitioning preserves the global MG guarantee") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[TokenIn]
    val q = HeavyHittersStream
      .heavyHittersStream(mem.toDS(), capacity = 3, groups = 4)
      .writeStream.format("memory").queryName("hh4").outputMode("append")
      .start()
    // 40 tokens: hot=12, warm=8, 20 singletons → bound n/4=10, hot
    // must survive in ITS group no matter how groups split the rest
    val noise = (1 to 20).map(i => TokenIn(s"tok$i"))
    mem.addData(Seq.fill(12)(TokenIn("hot")) ++ Seq.fill(8)(TokenIn("warm"))
      ++ noise: _*)
    q.processAllAvailable()
    val cands = currentCandidates("hh4")
    q.stop()
    val union = cands.values.flatten.toSet
    assert(union.contains("hot"), s"hot missing from $cands")
    assert(cands.values.forall(_.size <= 3), s"a group exceeded capacity: $cands")
  }

  test("offer step mirrors the batch frequent_items sketch") {
    // identical deterministic stream through both implementations
    val items = Seq("a", "a", "b", "c", "a", "d", "b", "e", "a", "f")
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach(i => HeavyHittersStream.offer(buf, 2, i, 1L))
    // batch sketch over one partition sees the same sequence
    val batch = spark.createDataset(items).coalesce(1)
      .toDF("token")
      .agg(graft.functions.GraftFunctions.frequentItems(
        org.apache.spark.sql.functions.col("token"), 2).as("c"))
      .selectExpr("explode(c) AS t").as[String].collect().toSet
    assert(buf.keySet == batch, s"streaming $buf vs batch $batch")
  }
}
