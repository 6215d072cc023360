package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5 — CSV scan (reference dataset_load, apps/training/sft.py:77-91
  * loads CSV via pandas; HuggingFace-dataset loading by name is out of
  * scope for a Spark engine and documented as such in SURVEY §2.1).
  */
object Csv {

  def read(spark: SparkSession, path: String,
           header: Boolean = true, inferSchema: Boolean = false): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
