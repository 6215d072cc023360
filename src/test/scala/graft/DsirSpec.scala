package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Dsir

/** DSIR importance resampling: the ratio table, the codegen'd
  * scan-local scoring pass (plan shape: no explode, no join, no
  * shuffle), target/proposal separation on a planted corpus, hash-mode
  * invariance of the ranking, and seeded-Gumbel determinism.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: docs 0-9 "target-ish", 10-19 not
  private def corpus = spark.range(20).select(
    col("id").as("doc_id"),
    when(col("id") < 10,
        concat(lit("alpha beta gamma delta epsilon zeta "),
          col("id").cast("string")))
      .otherwise(concat(lit("uno dos tres cuatro cinco seis "),
        col("id").cast("string"))).as("text"),
    (col("id") < 10).as("is_t"))

  test("every target-vocabulary doc outweighs every proposal-only doc") {
    val w = Dsir.weights(corpus, "text", col("is_t"), buckets = 256,
        alpha = 0.5)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    val tMin = (0L until 10L).map(w).min
    val pMax = (10L until 20L).map(w).max
    assert(tMin > pMax, s"target min $tMin <= proposal max $pMax")
  }

  test("ratio table is bucket-sized, finite, and defaults unseen buckets") {
    val t = Dsir.ratioTable(corpus, "text", col("is_t"), 64, 1.0)
    assert(t.length == 64)
    assert(t.forall(v => !v.isNaN && !v.isInfinite))
    // scoring a FOREIGN corpus hits unseen buckets via the default
    // ratio — finite, never a crash
    val foreign = Seq((1L, "zzz qqq www")).toDF("doc_id", "text")
    val s = Dsir.withScore(foreign, "text", t, "w")
      .select("w").as[Double].head()
    assert(!s.isNaN && !s.isInfinite)
  }

  test("scoring pass is one codegen'd scan: no shuffle, no explode, no join") {
    val table = Dsir.ratioTable(corpus, "text", col("is_t"), 128, 1.0)
    val scored = Dsir.withScore(corpus, "text", table, "w")
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
    // "*(1)" prefixes = the stage is inside WholeStageCodegen span 1
    assert(plan.contains("*(1) Project"), plan)
  }

  test("ranking is hash-mode invariant on a separated corpus") {
    def topIds = Dsir.select(corpus, "doc_id", "text", col("is_t"),
        buckets = 256, alpha = 0.5, k = 10)
      .select("doc_id").as[Long].collect().toSet
    val md5Top = topIds
    spark.conf.set(GraftFunctions.HashModeKey, "xxhash64")
    try {
      assert(topIds == md5Top)
      assert(md5Top == (0L until 10L).toSet)
    } finally spark.conf.set(GraftFunctions.HashModeKey, "md5")
  }

  test("seeded Gumbel selection is deterministic; seeds differ") {
    def sel(seed: Long) = Dsir.select(corpus, "doc_id", "text",
        col("is_t"), buckets = 256, alpha = 0.5, k = 20,
        gumbelSeed = Some(seed))
      .select("doc_id", "sel_key").as[(Long, Double)].collect().toSeq
    val a = sel(7L)
    assert(a == sel(7L))
    assert(a.map(_._2) != sel(8L).map(_._2))
    // noise perturbs but a strongly separated target still dominates:
    // weights differ by >> Gumbel scale on this corpus
    assert(a.take(10).map(_._1).toSet == (0L until 10L).toSet)
  }

  test("null text scores null; empty text scores zero") {
    val d = Seq((1L, Option("alpha beta")), (2L, None), (3L, Option("")))
      .toDF("doc_id", "text")
    val t = Dsir.ratioTable(corpus, "text", col("is_t"), 64, 1.0)
    val out = Dsir.withScore(d, "text", t, "w")
      .select("doc_id", "w").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty)
    assert(out(3L) == Some(0.0))
  }
}
