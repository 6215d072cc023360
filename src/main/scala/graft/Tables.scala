package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). Every query entry point receives the
  * scale-factor directory and loads only the tables it needs, so
  * Catalyst's column pruning + filter pushdown reach the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS), which Spark's reader
    // rejects. Read nanos as long and floor to microseconds in integer
    // arithmetic (a double round-trip would lose precision: ns epochs
    // exceed 2^53). DuckDB's reader truncates to micros the same way,
    // so both engines see identical timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views for spark.sql queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
