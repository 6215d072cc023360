package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** lshParamPlan: the analytic monotonicity and selection invariants
  * on a corpus with planted similarity levels.
  */
class ParamPlanSpec extends SparkSpec {
  import spark.implicits._

  // base docs + near-identical copies (J ≈ 1) + half-truncations
  // (J ≈ 0.5-0.6): both sides of the 0.7 target populated
  private def corpus = {
    val words = (0 until 400).map(i => s"tok$i")
    def doc(seed: Int, n: Int) =
      (0 until n).map(i => words((seed * 13 + i) % words.size)).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc(i, 60)))
    val dups = (0 until 30).map(i => (1000L + i, doc(i, 60) + " extraa"))
    val halves = (0 until 30).map(i => (2000L + i, doc(i, 38)))
    (base ++ dups ++ halves).toDF("doc_id", "text")
  }

  test("recall and waste are monotone in bands; selection honors the floor") {
    val rows = Similarity.lshParamPlan(corpus, "doc_id", "text",
        tauMin = 0.3, tauTarget = 0.7, recallFloor = 0.9)
      .orderBy(col("bands"))
      .select(col("bands"), col("exp_recall"), col("exp_waste"),
        col("selected"))
      .collect()
    val recalls = rows.map(_.getDouble(1))
    val wastes = rows.map(_.getDouble(2))
    // more bands ⇒ strictly more collisions on BOTH sides of the
    // threshold: 1−(1−s^r)^b rises as (b, r) moves toward (many, few)
    assert(recalls.sameElements(recalls.sorted),
      s"recall must rise with bands: ${recalls.toSeq}")
    assert(wastes.sameElements(wastes.sorted),
      s"waste must rise with bands: ${wastes.toSeq}")
    val selected = rows.filter(_.getBoolean(3))
    assert(selected.length == 1, "exactly one plan selected")
    val selBands = selected.head.getLong(0)
    // invariant: every ok plan with FEWER bands than the winner
    // would contradict fewest-bands-meeting-floor
    rows.foreach { r =>
      if (r.getDouble(1) >= 0.9 && r.getLong(0) < selBands)
        fail(s"plan ${r.getLong(0)} meets the floor with fewer bands")
    }
    assert(selected.head.getDouble(1) >= 0.9,
      s"winner misses the floor: ${selected.head}")
  }

  test("an unreachable floor falls back to the max-recall plan") {
    val rows = Similarity.lshParamPlan(corpus, "doc_id", "text",
        tauMin = 0.3, tauTarget = 0.7, recallFloor = 1.1)
      .select(col("bands"), col("exp_recall"), col("selected")).collect()
    val sel = rows.filter(_.getBoolean(2))
    assert(sel.length == 1)
    assert(sel.head.getDouble(1) == rows.map(_.getDouble(1)).max,
      s"fallback must pick max recall: ${sel.head}")
  }
}
