package graft
import org.apache.spark.sql.SparkSession

/** Benchmark driver: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query medians.
  *
  * Each query is timed SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  * median is reported — this VM shows order-of-magnitude wall-clock
  * swings (SCALING.md), so single-shot numbers are not comparable
  * across rounds. SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to a subset
  * for local iteration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = LocalSession.build("32")
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_HASH_MODE=xxhash64 benches the production hash mode
    // (Verify/oracle runs never set this — they stay on md5)
    sys.env.get("SPARK_GRAFT_HASH_MODE").foreach(m =>
      spark.conf.set(graft.functions.GraftFunctions.HashModeKey, m))
    // JVM warm-up: a tiny query touching higher-order functions and a
    // shuffle, so the first timed query doesn't absorb the one-time
    // Janino/lambda codegen cost (~5-15 s, measured) that every
    // executor JVM pays exactly once.
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1000)
        .select(aggregate(transform(sequence(lit(0), lit(3)), i => i * 2),
          lit(0L), (a, b) => a + b).as("v"))
        .groupBy(col("v")).count()
        .write.format("noop").mode("overwrite").save()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val queries = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    val results = queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        // isolate runs: drop cached data/broadcasts accumulated by the
        // previous query so its GC debt isn't billed to this one
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        // noop sink forces full evaluation of every output column;
        // count() would let Catalyst prune the projections being timed.
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> median(times)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}"""
    println(line)
    // Also write the record to a file: the driver's stdout capture has
    // truncated mid-line before (BENCH_r02), so the canonical copy is
    // on disk and self-contained.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out: $e") }
    spark.stop()
  }
}
