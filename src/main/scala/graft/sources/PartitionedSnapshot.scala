package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned-snapshot maintenance — the second production ingest
  * shape next to keyed MERGE (`merge_upsert_documents`): idempotent
  * partition replacement, i.e. `INSERT OVERWRITE ... PARTITION`.
  * A crawler or daily batch re-delivers one partition's worth of
  * data; the table must atomically swap exactly the partitions
  * present in the batch and leave every other partition's files
  * untouched (no read-modify-write of the whole table, no appended
  * duplicates on retry — re-running the same batch is a no-op).
  *
  * Spark-first: this is `partitionOverwriteMode=dynamic` on a
  * partitioned parquet write — the writer stages new files per
  * incoming partition and commits by directory swap, so at 100 TB the
  * cost is proportional to the REPLACED partitions, not the table.
  * (Static mode — the default — would truncate the whole table
  * first; the per-write option pins dynamic regardless of session
  * config.)
  */
object PartitionedSnapshot {

  /** Write a full snapshot partitioned by `partitionCol`. */
  def write(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(path)

  /** Idempotently replace exactly the partitions present in `batch`:
    * dynamic partition overwrite — untouched partitions keep their
    * existing files byte-for-byte.
    */
  def overwritePartitions(batch: DataFrame, path: String,
                          partitionCol: String): Unit =
    batch.write.partitionBy(partitionCol).mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(path)

  /** Read the current snapshot back. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
