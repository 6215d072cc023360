package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** KLL-style deterministic quantile sketch (expressions.KllQuantileAgg):
  * exactness below k (no compaction ⇒ err_bound 0), the hard rank-error
  * envelope under arbitrary partitionings (the guarantee must hold for
  * ANY merge order), the analytic size of the accumulated bound, and
  * per-group operation inside groupBy.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)

  /** Deterministic value stream with duplicates and an uneven spread. */
  private def gen(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => ((i.toLong * 2654435761L) % 100003L).toDouble)

  /** (n, err_bound, est) of one global sketch over `vals`. */
  private def sketch(vals: Seq[Double], k: Int, parts: Int) = {
    val row = vals.toDF("v").repartition(parts)
      .agg(GraftFunctions.kllQuantiles(col("v"), k, qs).as("s"))
      .select(col("s.n"), col("s.err_bound"), col("s.est")).head()
    (row.getLong(0), row.getLong(1), row.getSeq[Double](2))
  }

  /** True lower-quantile and rank bounds from the raw values. */
  private def exactQ(sorted: IndexedSeq[Double], n: Long, q: Double): Double =
    sorted(math.max(1L, math.ceil(q * n).toLong).toInt - 1)

  test("kll is exact (err_bound 0) when n <= k") {
    val vals = gen(100)
    val sorted = vals.sorted
    val (n, err, est) = sketch(vals, k = 128, parts = 1)
    assert(n == 100L && err == 0L)
    qs.indices.foreach { i =>
      assert(est(i) == exactQ(sorted, n, qs(i)), s"q=${qs(i)}")
    }
  }

  test("kll envelope holds under 1, 7, and 32 partitions") {
    val n = 50000
    val vals = gen(n)
    val sorted = vals.sorted
    for (parts <- Seq(1, 7, 32)) {
      val (sn, err, est) = sketch(vals, k = 256, parts = parts)
      assert(sn == n.toLong)
      assert(err > 0L) // compactions definitely happened
      qs.indices.foreach { i =>
        val target = math.max(1L, math.ceil(qs(i) * n).toLong)
        val le = sorted.count(_ <= est(i)).toLong
        val lt = sorted.count(_ < est(i)).toLong
        assert(le >= target - err && lt < target + err,
          s"parts=$parts q=${qs(i)}: est=${est(i)} target=$target " +
            s"le=$le lt=$lt err=$err")
      }
    }
  }

  test("kll err_bound stays near the analytic (n/k)·log2(n/k) size") {
    val n = 50000
    val k = 256
    val (_, err, _) = sketch(gen(n), k, parts = 8)
    val analytic = (n.toDouble / k) * (math.log(n.toDouble / k) /
      math.log(2.0) + 2.0)
    // generous 3× headroom: merges add partial-buffer compactions
    assert(err.toDouble <= 3.0 * analytic, s"err=$err analytic=$analytic")
    // and the relative rank error is small in absolute terms
    assert(err.toDouble / n < 0.1, s"err=$err of n=$n")
  }

  test("kll works per-group inside groupBy with independent envelopes") {
    val n = 20000
    val rows = (0 until n).map { i =>
      val g = i % 3
      // distinct distributions per group
      (g, ((i.toLong * 40503L + g * 977L) % 9973L).toDouble * (g + 1))
    }
    val df = rows.toDF("g", "v").repartition(16)
    val out = df.groupBy(col("g"))
      .agg(GraftFunctions.kllQuantiles(col("v"), 64, qs).as("s"))
      .select(col("g"), col("s.n"), col("s.err_bound"), col("s.est"))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val g = r.getInt(0)
      val gn = r.getLong(1)
      val err = r.getLong(2)
      val est = r.getSeq[Double](3)
      val vals = rows.filter(_._1 == g).map(_._2).sorted
      assert(gn == vals.size.toLong)
      qs.indices.foreach { i =>
        val target = math.max(1L, math.ceil(qs(i) * gn).toLong)
        val le = vals.count(_ <= est(i)).toLong
        val lt = vals.count(_ < est(i)).toLong
        assert(le >= target - err && lt < target + err,
          s"g=$g q=${qs(i)}")
      }
    }
  }

  test("kll_quantile is callable from SQL via GraftExtensions") {
    val row = spark.sql(
      "SELECT kll_quantile(CAST(id AS DOUBLE), 64, 0.5D, 0.9D) AS s " +
        "FROM range(1, 1001)")
      .select(col("s.n"), col("s.err_bound"), col("s.est")).head()
    assert(row.getLong(0) == 1000L)
    val err = row.getLong(1)
    val est = row.getSeq[Double](2)
    // data is 1..1000, so value == rank: the envelope reads directly
    assert(math.abs(est(0) - 500.0) <= err + 1, s"p50=${est(0)} err=$err")
    assert(math.abs(est(1) - 900.0) <= err + 1, s"p90=${est(1)} err=$err")
  }

  test("kll_quantile accepts plain decimal literals from SQL (0.5, not just 0.5D)") {
    // Spark's SQL parser types `0.5` as DECIMAL(1,1), not DOUBLE —
    // the r8 builder only matched Double literals, so the undecorated
    // spelling threw (ADVICE r8). Integer quantile literals (1 = max)
    // and a LONG k must also bind.
    val row = spark.sql(
      "SELECT kll_quantile(CAST(id AS DOUBLE), 64, 0.5, 1) AS s " +
        "FROM range(1, 1001)")
      .select(col("s.n"), col("s.err_bound"), col("s.est")).head()
    assert(row.getLong(0) == 1000L)
    val err = row.getLong(1)
    val est = row.getSeq[Double](2)
    assert(math.abs(est(0) - 500.0) <= err + 1, s"p50=${est(0)} err=$err")
    assert(math.abs(est(1) - 1000.0) <= err + 1, s"p100=${est(1)} err=$err")
  }

  test("kll skips NULL and NaN but keeps ±Inf ordered") {
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](1.0, 2.0, null, Double.NaN, 3.0,
        Double.NegativeInfinity, Double.PositiveInfinity)
    val row = vals.toDF("v")
      .agg(GraftFunctions.kllQuantiles(col("v"), 64, Seq(0.01, 0.5, 1.0))
        .as("s"))
      .select(col("s.n"), col("s.err_bound"), col("s.est")).head()
    assert(row.getLong(0) == 5L) // null + NaN skipped
    val est = row.getSeq[Double](2)
    assert(est(0) == Double.NegativeInfinity)
    assert(est(1) == 2.0) // ceil(0.5*5)=3 → 3rd of -inf,1,2,3,inf
    assert(est(2) == Double.PositiveInfinity)
  }
}
