package graft

import org.apache.spark.sql.functions._

/** The opt-in COUNT(DISTINCT) → KMV optimizer rule
  * (graft.plans.ApproxDistinctRewrite, injected by GraftExtensions).
  */
class ApproxDistinctRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withFlag[T](on: Boolean, k: Int = 256)(body: => T): T = {
    spark.conf.set("spark.graft.approxDistinct", on.toString)
    spark.conf.set("spark.graft.approxDistinctK", k.toString)
    try body
    finally {
      spark.conf.set("spark.graft.approxDistinct", "false")
      spark.conf.unset("spark.graft.approxDistinctK")
    }
  }

  private def optimizedContainsKmv(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("kmv_distinct")

  test("flag off: plan untouched, exact distinct") {
    val df = spark.range(1000).select((col("id") % 100).as("v"))
      .agg(countDistinct(col("v")).as("d"))
    assert(!optimizedContainsKmv(df))
    assert(df.as[Long].head() == 100L)
  }

  test("flag on: plan rewritten; exact below k, approximate above") {
    withFlag(on = true, k = 256) {
      val small = spark.range(10000).select((col("id") % 100).as("v"))
        .agg(countDistinct(col("v")).as("d"))
      assert(optimizedContainsKmv(small))
      // fewer than k distincts → the sketch is exact by construction
      assert(small.as[Long].head() == 100L)

      val big = spark.range(200000).select(col("id").as("v"))
        .agg(countDistinct(col("v")).as("d"))
      val est = big.as[Long].head().toDouble
      assert(math.abs(est - 200000.0) / 200000.0 < 0.2,
        s"KMV estimate too far off: $est")
    }
  }

  test("flag on: grouped distinct rewrites and stays exact below k") {
    withFlag(on = true) {
      val df = spark.range(10000)
        .select((col("id") % 4).as("g"), (col("id") % 80).as("v"))
        .groupBy(col("g")).agg(countDistinct(col("v")).as("d"))
      assert(optimizedContainsKmv(df))
      val rows = df.as[(Long, Long)].collect().toMap
      assert(rows.keySet == Set(0L, 1L, 2L, 3L))
      // ids ≡ g (mod 4) and v = id % 80: per group v takes 20 values
      assert(rows.values.forall(_ == 20L), s"got $rows")
    }
  }

  test("flag on: nulls are not counted (null guard filter)") {
    withFlag(on = true) {
      val df = Seq[(Integer, String)]((1, "a"), (2, "b"), (3, null),
          (4, "a"), (5, null))
        .toDF("id", "v")
        .agg(countDistinct(col("v")).as("d"))
      assert(optimizedContainsKmv(df))
      assert(df.as[Long].head() == 2L)
    }
  }

  test("flag on: multi-argument count distinct stays exact") {
    withFlag(on = true) {
      val df = spark.range(1000)
        .select((col("id") % 10).as("a"), (col("id") % 20).as("b"))
        .agg(countDistinct(col("a"), col("b")).as("d"))
      assert(!optimizedContainsKmv(df))
      assert(df.as[Long].head() == 20L)
    }
  }
}
