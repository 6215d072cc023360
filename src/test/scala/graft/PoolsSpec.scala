package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.functions._

import graft.ops.Pools

/** Guarded broadcast-pool construction (negative sampling /
  * hard-negative mining): divisor is a real parameter, over-budget
  * pools trigger the guard instead of a doomed broadcast build.
  */
class PoolsSpec extends SparkSpec {

  private def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty

  test("detHashPool is a deterministic 1-in-k sample and validates k") {
    val d = spark.range(10000L).withColumnRenamed("id", "doc_id")
    val p1 = Pools.detHashPool(d, "doc_id", 10L)
    val n = p1.count()
    // detHash is uniform-ish: expect ~1000 of 10000, generous band
    assert(n > 700 && n < 1300, s"pool size $n outside band")
    // same input, same divisor → identical membership at any run
    assert(p1.orderBy("doc_id").collect()
      .sameElements(Pools.detHashPool(d, "doc_id", 10L).orderBy("doc_id").collect()))
    intercept[IllegalArgumentException](Pools.detHashPool(d, "doc_id", 0L))
  }

  test("guardedBroadcast hints the join when the pool fits") {
    val pool = spark.range(100L).withColumnRenamed("id", "doc_id")
    assert(hinted(Pools.guardedBroadcast(pool, maxPoolRows = 1000L)))
  }

  test("oversized pool fails fast when asked") {
    val pool = spark.range(5000L).withColumnRenamed("id", "doc_id")
    val ex = intercept[IllegalStateException](
      Pools.guardedBroadcast(pool, maxPoolRows = 100L, failFast = true))
    assert(ex.getMessage.contains("5000"))
    assert(ex.getMessage.contains("poolDivisor"))
  }

  test("oversized pool falls back to an un-hinted (shuffle) join with identical results") {
    val corpus = spark.range(2000L).withColumnRenamed("id", "doc_id")
    val pool = Pools.detHashPool(corpus, "doc_id", 7L)
      .withColumnRenamed("doc_id", "neg_id")
    val over = Pools.guardedBroadcast(pool, maxPoolRows = 10L)
    assert(!hinted(over))
    val fits = Pools.guardedBroadcast(pool, maxPoolRows = 100000L)
    assert(hinted(fits))
    val viaShuffle = corpus.join(over, col("doc_id") =!= col("neg_id"))
      .groupBy("doc_id").agg(min("neg_id").as("m"))
      .orderBy("doc_id").collect()
    val viaBroadcast = corpus.join(fits, col("doc_id") =!= col("neg_id"))
      .groupBy("doc_id").agg(min("neg_id").as("m"))
      .orderBy("doc_id").collect()
    assert(viaShuffle.sameElements(viaBroadcast))
  }
}
