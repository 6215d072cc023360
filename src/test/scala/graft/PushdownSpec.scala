package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Scan-efficiency tripwires beyond filter/column pushdown (covered
  * in RelationalSpec): parquet AGGREGATE pushdown (min/max/count
  * answered from footer metadata, zero row reads) and dynamic
  * partition pruning (the dimension filter reaching the fact scan at
  * runtime) — the two features that turn a 100 TB full-scan
  * aggregate/join into metadata traffic plus the matching partitions.
  */
class PushdownSpec extends SparkSpec {

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("parquet aggregate pushdown answers min/max/count from footers") {
    val dir = Files.createTempDirectory("graft-aggpush").toString
    spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
      .write.mode("overwrite").parquet(dir)
    // aggregate pushdown is a DSv2-only capability; isolate the v2
    // source switch in a child session so the shared session's v1
    // path (which every other suite exercises) is untouched
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s2.read.parquet(dir).createOrReplaceTempView("aggpush_t")
    // COUNT(*) (not count(1) — the v2 translation only recognizes the
    // star form as CountStar) + MIN/MAX on a flat column
    val agg = s2.sql(
      "SELECT COUNT(*) AS n, MIN(v) AS mn, MAX(v) AS mx FROM aggpush_t")
    val plan = agg.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedAggregation"),
      s"aggregate not pushed to the scan:\n$plan")
    val row = agg.head()
    assert(row.getLong(0) == 10000L && row.getLong(1) == 0L &&
      row.getLong(2) == 19998L)
  }

  test("runtime bloom-filter join pruning injects might_contain on the " +
    "probe side") {
    val dir = Files.createTempDirectory("graft-rtbloom").toString
    spark.range(0, 200000).selectExpr("id", "id % 1000 AS k")
      .write.mode("overwrite").parquet(dir)
    // child session: lower the size thresholds so the optimizer
    // considers the tiny test tables bloom-worthy (at real scale the
    // defaults — 10 MB build side — gate the same rewrite)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    // selective build side; disable broadcast so the shuffle-join path
    // (where the runtime filter pays) is chosen
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = s2.read.parquet(dir)
    val dim = s2.read.parquet(dir).where(col("id") < 50)
      .selectExpr("k AS dk")
    val joined = fact.join(dim, col("k") === col("dk"))
    val plan = fmt(joined)
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in plan:\n$plan")
    assert(joined.count() == 50L * 200L)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // the runtime answer to key skew (complementing the explicit
    // saltedJoin operator): AQE detects the oversized partition
    // AFTER the map stage and fans it out. Child session so the tiny
    // thresholds don't leak into other suites.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // 95 % of rows share key 0; the rest spread over 100 keys
    val left = s2.range(0, 300000).selectExpr(
      "CASE WHEN id % 20 < 19 THEN 0 ELSE id % 100 END AS k", "id AS v")
    val right = s2.range(0, 100).selectExpr("id AS k", "id AS w")
    val j = left.join(right, "k")
    // execute THIS DataFrame's own QueryExecution (count() would spawn
    // a separate one and leave j's plan isFinalPlan=false)
    val n = j.collect().length
    assert(n == 300000 * 19 / 20 + (0 until 300000)
      .count(i => i % 20 == 19 && i % 100 < 100))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("skewed"),
      s"AQE did not mark the join skewed:\n$plan")
  }

  test("dynamic partition pruning reaches the partitioned fact scan") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    // fact partitioned by year; dim maps year -> flag with a selective
    // filter, so the fact scan should prune to the matching partitions
    // at RUNTIME (the filter value is only known after the dim scan)
    spark.range(0, 20000)
      .selectExpr("id", "CAST(1992 + id % 8 AS INT) AS year")
      .write.mode("overwrite").partitionBy("year").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(1992, 2000)
      .selectExpr("CAST(id AS INT) AS year",
        "CASE WHEN id = 1995 THEN 'pick' ELSE 'skip' END AS flag")
    val joined = fact.join(dim, Seq("year")).where(col("flag") === "pick")
    val plan = fmt(joined)
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    assert(joined.count() == 2500L) // 20000 / 8 rows in year 1995
  }
}
