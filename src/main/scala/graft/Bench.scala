package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      // isolate queries: drop cached data/broadcasts accumulated by
      // the previous query so its GC debt isn't billed to this one
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column;
      // count() would let Catalyst prune the projections being timed.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
