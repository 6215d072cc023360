package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.KllStream
import graft.streaming.KllStream.{GroupQuantiles, Obs}

/** Streaming KLL quantiles: shared-kernel parity with the batch
  * aggregate's envelope across micro-batch slicings, exactness below
  * k, bounded state growth.
  */
class KllStreamSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.5, 0.9, 0.99)

  private def runStream(batches: Seq[Seq[Obs]], k: Int)
      : Map[Int, GroupQuantiles] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = KllStream.kllStream(mem.toDS(), k, qs)
      .writeStream.format("memory").queryName("kllst")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.sql("SELECT * FROM kllst").as[GroupQuantiles]
      .collect().toSeq
    q.stop()
    rows.groupBy(_.g).map { case (g, rs) => g -> rs.maxBy(_.version) }
  }

  test("streamed sketch is exact below k regardless of batch slicing") {
    val vals = (1 to 100).map(i => Obs(0, i.toDouble))
    val out = runStream(vals.grouped(23).toSeq, k = 128)(0)
    assert(out.n == 100L && out.err_bound == 0L)
    // data is 1..100 so value == rank: lower quantiles are exact
    assert(out.est == Seq(50.0, 90.0, 99.0))
  }

  test("streamed envelope holds per group across many micro-batches") {
    val n = 20000
    val rows = (0 until n).map { i =>
      Obs(i % 2, ((i.toLong * 2654435761L) % 99991L).toDouble)
    }
    val out = runStream(rows.grouped(1700).toSeq, k = 64)
    assert(out.keySet == Set(0, 1))
    out.foreach { case (g, r) =>
      val vals = rows.filter(_.g == g).map(_.v).sorted
      assert(r.n == vals.size.toLong)
      assert(r.err_bound > 0L)
      qs.zip(r.est).foreach { case (q, est) =>
        val target = math.max(1L, math.ceil(q * r.n).toLong)
        val le = vals.count(_ <= est).toLong
        val lt = vals.count(_ < est).toLong
        assert(le >= target - r.err_bound && lt < target + r.err_bound,
          s"g=$g q=$q est=$est err=${r.err_bound}")
      }
      // errBound stays in the analytic (n/k)·log2(n/k) class — the
      // evidence the stream is compacting, not keeping raw values
      val analytic = (r.n.toDouble / 64) *
        (math.log(r.n.toDouble / 64) / math.log(2.0) + 2.0)
      assert(r.err_bound.toDouble <= 2.0 * analytic,
        s"g=$g err=${r.err_bound} analytic=$analytic")
    }
  }

  test("an all-NaN micro-batch emits nothing — (g, version) stays unique") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = KllStream.kllStream(mem.toDS(), k = 64, qs)
      .writeStream.format("memory").queryName("kllnan")
      .outputMode("append").start()
    mem.addData((1 to 10).map(i => Obs(0, i.toDouble)): _*)
    q.processAllAvailable()
    // every row NaN-filtered: the sketch absorbs nothing, so the
    // group must NOT re-emit its unchanged version (ADVICE r8 — a
    // duplicate (g, version) row breaks max-version consumers)
    mem.addData(Obs(0, Double.NaN), Obs(0, Double.NaN))
    q.processAllAvailable()
    mem.addData(Obs(0, 11.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT g, version FROM kllnan")
      .as[(Int, Long)].collect().toSeq
    q.stop()
    assert(rows.sorted == Seq((0, 10L), (0, 11L)),
      s"expected exactly versions 10 and 11, got $rows")
  }

  test("stream and batch aggregate share the envelope on the same rows") {
    val n = 5000
    val rows = (0 until n).map(i => Obs(7, (i * 37 % 1009).toDouble))
    val streamed = runStream(rows.grouped(613).toSeq, k = 64)(7)
    val batch = rows.toDF("g", "v")
      .agg(graft.functions.GraftFunctions
        .kllQuantiles(org.apache.spark.sql.functions.col("v"), 64, qs)
        .as("s"))
      .select("s.n", "s.err_bound").head()
    assert(streamed.n == batch.getLong(0))
    // bounds differ (different insert/merge orders) but both stay in
    // the same asymptotic class
    val analytic = (n.toDouble / 64) *
      (math.log(n.toDouble / 64) / math.log(2.0) + 2.0)
    assert(streamed.err_bound.toDouble <= 3.0 * analytic)
    assert(batch.getLong(1).toDouble <= 3.0 * analytic)
  }
}
