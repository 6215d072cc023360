package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Token/cost estimation (reference A7/L14,
  * apps/cost_estimator_inf.py:35-78): token-count the encoding text,
  * estimate decode tokens as a fixed ratio of input, price per
  * million tokens. The reference uses a real HF tokenizer; offline we
  * use the deterministic BPE-ish regex count (GraftFunctions
  * .bpeTokenCount) — the operator shape (scan-time count + two-level
  * aggregation) is the part that matters at scale.
  */
object Cost {

  /** Reference defaults (apps/cost_estimator_inf.json: gemma-2-9b at
    * $0.15/$0.60 per 1M tokens, out ≈ 0.7 × in).
    */
  val DefaultInPricePerM = 0.15
  val DefaultOutPricePerM = 0.60
  val DefaultIoRatio = 0.7

  /** Per-row token count + cost estimate columns. */
  def withCost(df: DataFrame, textCol: String,
               inPricePerM: Double = DefaultInPricePerM,
               outPricePerM: Double = DefaultOutPricePerM,
               ioRatio: Double = DefaultIoRatio): DataFrame = {
    val inTok = bpeTokenCount(col(textCol)).cast("long")
    df.withColumn("in_tokens", inTok)
      .withColumn("cost_usd", round(
        inTok / lit(1e6) * lit(inPricePerM) +
          inTok * lit(ioRatio) / lit(1e6) * lit(outPricePerM), 9))
  }

  /** Exact token count under a learned BPE merges table (see
    * expressions.BpeTokenCount): the deployment-grade counter for
    * models whose merges.txt is available. The regex estimate above
    * stays the oracle-gated default.
    */
  def bpeVocabTokenCount(c: Column, vocab: graft.expressions.BpeVocab): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.expressions.BpeTokenCount(GraftColumnBridge.expression(c), vocab))
  }

  /** Grouped cost report: rows, token sum/mean, total cost. */
  def costReport(df: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame = {
    val withTok = withCost(df, textCol)
    // means and money go through decimal before rounding: rounding the
    // double quotient diverges from the oracle at *.xx5 boundaries
    // (double 0.575 is 0.57499…, which DuckDB rounds down but Spark's
    // toString-canonicalizing round rounds up)
    import org.apache.spark.sql.types.DecimalType
    withTok.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("in_tokens")).as("sum_in_tokens"),
        round((sum(col("in_tokens")).cast(DecimalType(18, 6)) / count(lit(1)))
          .cast(DecimalType(18, 6)), 2).cast("double").as("avg_in_tokens"),
        round(sum(col("cost_usd").cast(DecimalType(18, 9))), 6)
          .cast("double").as("total_cost_usd"))
  }
}
