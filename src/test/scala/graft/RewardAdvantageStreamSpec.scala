package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.streaming.RewardAdvantageStream
import graft.streaming.RewardAdvantageStream.{GroupMoments, Obs}

/** Streaming GRPO moments: exact batch parity across micro-batch
  * slicings (the BigInt sums are order-independent), versioned-row
  * uniqueness, NaN-drop, and bounded state.
  */
class RewardAdvantageStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Obs]]): Seq[GroupMoments] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = RewardAdvantageStream.advantageStream(mem.toDS())
      .writeStream.format("memory").queryName("advst")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.sql("SELECT * FROM advst").as[GroupMoments]
      .collect().toSeq
    q.stop()
    rows
  }

  private val corpus = (0 until 300).map { i =>
    Obs(s"s${i % 5}", ((i * 37) % 101) / 100.0) // 2-decimal rewards
  }

  test("final moments are bit-identical to the batch DECIMAL-sum moments") {
    val rows = runStream(corpus.grouped(77).toSeq)
    val last = rows.groupBy(_.g).map { case (g, rs) => g -> rs.maxBy(_.version) }
    // batch moments exactly as Reward.groupNormalizedAdvantage computes
    // them: DECIMAL(18,6) sums -> double division
    val d = col("r").cast(DecimalType(18, 6))
    val batch = corpus.toDF("g", "r").groupBy("g")
      .agg(count(lit(1)).as("n"), sum(d).as("s1"), sum(d * d).as("s2"))
      .select(col("g"), col("n"),
        (col("s1").cast("double") / col("n")).as("mu"),
        sqrt(greatest(col("s2").cast("double") / col("n")
          - (col("s1").cast("double") / col("n"))
            * (col("s1").cast("double") / col("n")), lit(0.0))).as("sigma"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(last.keySet == batch.keySet)
    last.foreach { case (g, m) =>
      val (_, n, mu, sigma) = batch(g)
      assert(m.n == n)
      assert(m.mu == mu, s"g=$g stream ${m.mu} batch $mu") // exact
      assert(math.abs(m.sigma - sigma) < 1e-15, s"g=$g")
    }
  }

  test("slicing-invariant: one batch vs many yields identical snapshots") {
    val a = runStream(Seq(corpus))
    val b = runStream(corpus.grouped(13).toSeq)
    def fin(rs: Seq[GroupMoments]) =
      rs.groupBy(_.g).map { case (g, r) => g -> r.maxBy(_.version) }
        .map { case (g, m) => (g, m.n, m.mu, m.sigma) }.toSet
    assert(fin(a) == fin(b))
  }

  test("(g, version) rows are unique and versions strictly increase") {
    val rows = runStream(corpus.grouped(50).toSeq)
    assert(rows.map(r => (r.g, r.version)).distinct.size == rows.size)
    rows.groupBy(_.g).foreach { case (_, rs) =>
      val vs = rs.sortBy(_.version).map(_.version)
      assert(vs == vs.distinct.sorted)
    }
  }

  test("NaN rewards are dropped, an all-NaN micro-batch emits nothing") {
    val rows = runStream(Seq(
      Seq(Obs("g", 1.0), Obs("g", Double.NaN)),
      Seq(Obs("g", Double.NaN)), // absorbs nothing -> no emission
      Seq(Obs("g", 3.0))))
    assert(rows.map(_.version).sorted == Seq(1L, 2L))
    val last = rows.maxBy(_.version)
    assert(last.n == 2L && last.mu == 2.0)
  }
}
