package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Column names and row order must match between the two — the driver
  * sorts columns by name and hash-compares values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  /** All registries merged; later additions must keep names unique. */
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ PipelineQueries.defs ++ JudgeQueries.defs ++
      EventQueries.defs ++ AdvancedQueries.defs
}
