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
    * unpivoted to rows — no per-rule re-scan. Rule names travel only
    * as `lit()` values (never spliced into generated SQL, so quotes /
    * backticks in a name are data, not syntax), internal aggregate
    * columns are positional, and each sum is coalesced so an empty
    * input reports 0 violations per rule, matching a COUNT-based
    * oracle.
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "violations() needs at least one rule")
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L)).as(s"__r$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col(s"__r$i").as("violations"))
      }: _*)).as("__kv"))
      .select(col("__kv.rule").as("rule"),
        col("__kv.violations").as("violations"))
  }

  /** Duplicate count for a key that the contract declares unique:
    * rows − distinct keys (0 when the key is unique). Null keys count
    * as one shared key, surfacing them too.
    */
  def keyDuplicates(df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("violations"))
      .select(lit(s"unique_$key").as("rule"), col("violations"))
}
