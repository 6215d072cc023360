package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC scan/sink — the columnar alternative to parquet for warehouses
  * already standardized on ORC (Hive lineage). Same pushdown story as
  * parquet in Spark: predicate pushdown, column pruning, and stripe
  * statistics all apply, so every query in this engine runs unchanged
  * over ORC tables. (spark-avro is a separate module not shipped in
  * this container's jars, so Avro is documented out of scope; ORC is
  * built into spark-sql.)
  */
object Orc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** zstd by default — matches the parquet sink posture for cold
    * corpus data (smaller files dominate scan cost at 100 TB).
    */
  def write(df: DataFrame, path: String,
            compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)
}
