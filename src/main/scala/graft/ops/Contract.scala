package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation — the schema/constraint gate an ingest
  * pipeline runs before data reaches training (the Deequ /
  * Great-Expectations pattern, Spark-first): every rule is a Column
  * predicate, and the whole contract evaluates as ONE conditional
  * aggregate over ONE scan — at 100 TB the contract costs exactly one
  * pass regardless of how many rules it carries. A NULL predicate
  * result counts as a violation (unknown ⇒ not proven valid).
  *
  * Key-uniqueness is the one contract that can't be a row predicate;
  * [[keyDuplicates]] reports it from the same grammar (count −
  * distinct), one hash aggregate.
  */
object Contract {

  /** (rule name, must-hold predicate) pairs → one row per rule with
    * its violation count. Single scan, single (tiny) aggregate row,
    * unpivoted to rows with a literal stack — no per-rule re-scan.
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', `$name`" }
      .mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, violations)")
  }

  /** Duplicate count for a key that the contract declares unique:
    * rows − distinct keys (0 when the key is unique). Null keys count
    * as one shared key, surfacing them too.
    */
  def keyDuplicates(df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("violations"))
      .select(lit(s"unique_$key").as("rule"), col("violations"))
}
