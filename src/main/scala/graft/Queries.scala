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
  /** All registries merged; duplicate names would silently shadow each
    * other in SparkEntry's maps, so they fail fast here.
    */
  lazy val all: Seq[QueryDef] = {
    val defs =
      RelationalQueries.defs ++ StarQueries.defs ++
        TextQueries.defs ++ DedupQueries.defs ++
        SimilarityQueries.defs ++ PipelineQueries.defs ++ JudgeQueries.defs ++
        EventQueries.defs ++ AdvancedQueries.defs
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }
}
