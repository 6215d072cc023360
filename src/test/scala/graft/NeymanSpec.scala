package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Neyman stratified sampler: exact-budget quotas, variance-driven
  * skew, the N_h cap, degenerate all-constant strata, and draw
  * determinism under repartitioning.
  */
class NeymanSpec extends SparkSpec {
  import spark.implicits._

  // 3 strata: "wide" (high σ), "narrow" (low σ), "tiny" (2 rows,
  // forces the N_h cap at any meaningful budget)
  private def corpus = {
    val wide = (0 until 40).map(i => ("wide", (i * 97 % 1000).toDouble, i.toLong))
    val narrow = (0 until 40).map(i => ("narrow", 500.0 + (i % 3), 100L + i))
    val tiny = Seq(("tiny", 0.0, 200L), ("tiny", 1000.0, 201L))
    (wide ++ narrow ++ tiny).toDF("g", "v", "id")
  }

  test("quotas sum to the budget; variance attracts budget; N_h caps") {
    val out = Relational.neymanStratifiedSample(corpus, "g", "v", "id", 20L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val allocs = out.view.mapValues(_._3).toMap
    // tiny's N_h·σ is large per row but caps at 2; the cap may leave
    // the SUM under budget (documented no-redistribution contract)
    assert(allocs("tiny") == 2L, s"cap: $allocs")
    assert(allocs("wide") > allocs("narrow"),
      s"σ must attract budget: $allocs")
    assert(allocs.values.sum <= 20L)
    // n_sampled == alloc everywhere (draw honors the quota exactly)
    out.foreach { case (g, (_, _, alloc, drawn)) =>
      assert(drawn == alloc, s"$g drew $drawn of $alloc") }
  }

  test("all-constant strata degrade to proportional allocation") {
    val flat = ((0 until 30).map(i => ("a", 5.0, i.toLong)) ++
      (0 until 10).map(i => ("b", 7.0, 100L + i))).toDF("g", "v", "id")
    val out = Relational.neymanStratifiedSample(flat, "g", "v", "id", 8L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("a" -> 6L, "b" -> 2L),
      s"σ≡0 must fall back to N_h-proportional: $out")
  }

  test("the draw is identical under repartitioning") {
    val a = Relational.neymanStratifiedSample(corpus, "g", "v", "id", 20L)
      .select(col("g"), col("ids_md5")).collect().toSeq.sortBy(_.getString(0))
    val b = Relational.neymanStratifiedSample(
        corpus.repartition(7), "g", "v", "id", 20L)
      .select(col("g"), col("ids_md5")).collect().toSeq.sortBy(_.getString(0))
    assert(a.map(_.toString) == b.map(_.toString),
      "hash-rank draw must not depend on partitioning")
  }

  test("a huge budget caps the high-σ strata but still allocates by share") {
    // no-redistribution contract: capped strata draw ALL their rows,
    // low-σ strata keep their SHARE-sized quota even though budget is
    // left over — the leftover is the documented single-pass trade
    val out = Relational.neymanStratifiedSample(corpus, "g", "v", "id", 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val (wideN, wideA, wideD) = out("wide")
    val (tinyN, tinyA, tinyD) = out("tiny")
    assert(wideA == wideN && wideD == wideN, s"wide caps at N_h: $out")
    assert(tinyA == tinyN && tinyD == tinyN, s"tiny caps at N_h: $out")
    val (narrowN, narrowA, narrowD) = out("narrow")
    assert(narrowA < narrowN && narrowD == narrowA,
      s"narrow keeps its share-sized quota: $out")
  }
}
