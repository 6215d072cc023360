package graft

/** Good–Turing count-of-counts report and the KMV accuracy curve:
  * mass identities, estimator sanity, and the error-vs-k monotone the
  * curve exists to show.
  */
class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gt =
    SparkEntry.queries("vocab_good_turing")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double, Option[Double], Option[Double])]
      .collect().head

  test("count-of-counts identities hold") {
    val (nTok, nTypes, n1, n2, n3, p0, r1, r2) = gt
    assert(nTypes <= nTok)
    assert(n1 + n2 + n3 <= nTypes)
    assert(p0 > 0.0 && p0 < 1.0)
    assert(math.abs(p0 - n1.toDouble / nTok) < 1e-6)
    // discounted counts sit below their raw r when the histogram
    // decays (N_{r+1} < N_r), the regime this corpus is in
    assert(n2 < n1 && n3 < n2)
    assert(r1.exists(v => v > 0.0 && v < 1.0 * 2))
    assert(r2.exists(v => v > 0.0 && v < 3.0))
  }

  test("kmv error curve: estimates within theory bars, bars shrink") {
    val rows = SparkEntry.queries("sketch_kmv_error_curve")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(64L, 256L, 1024L))
    val exact = rows.head._3
    rows.foreach { case (k, est, ex, relErr, theoryErr) =>
      assert(ex == exact)
      assert(est > 0L)
      // 3-sigma acceptance: KMV rel-err concentrates at 1/sqrt(k-2)
      assert(relErr <= 3.0 * theoryErr, s"k=$k rel_err $relErr")
    }
    // the dial the curve exists to show: bigger k, tighter bar
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.reverse.toSeq)
  }
}
