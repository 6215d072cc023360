package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.GraftFunctions.wordCount
import graft.ops.Text

/** Streaming parity for the batch `curation_funnel` report: the same
  * cumulative filter-chain survival accounting (lang → length →
  * quality → diversity → exact-unique) over an unbounded document
  * stream.
  *
  * Stages 1–4 are pure scan-time expressions shared verbatim with the
  * batch query via [[flagCols]] — parity holds by construction, not by
  * coincidence. Stage 5 (exact first-occurrence) is the only stateful
  * piece: a one-bit claim per md5 key in flatMapGroupsWithState, the
  * same bounded-state contract as [[MinHashStream.minhashDedupStream]]
  * (optional processing-time TTL for long-running streams; exact
  * duplicates of a long-silent doc then re-count as first — the
  * standard dedup-window trade). The funnel totals themselves are an
  * ordinary unwindowed streaming aggregation (query it with
  * OutputMode.Complete): O(1) state — twelve counters — updated per
  * micro-batch.
  *
  * At 100 TB-scale ingest the stream partitions by md5 key for the
  * state op, the aggregation state is constant-size, and nothing ever
  * re-reads history — the incremental form of a report whose batch
  * recompute would re-scan the full corpus.
  */
object CurationStream {

  final case class DocFlags(k: String, nw: Long, b1: Boolean, b2: Boolean,
                            b3: Boolean, b4: Boolean)
  final case class FlagsFirst(nw: Long, b1: Boolean, b2: Boolean,
                              b3: Boolean, b4: Boolean, b5: Boolean)

  /** The funnel's stage flags — identical expressions to the batch
    * `curation_funnel` query (TextQueries): md5 dedup key, word count,
    * lang-known, length window, quality threshold, distinct-word
    * diversity.
    */
  def flagCols(text: Column): Seq[Column] = {
    val lw = split(lower(text), " ")
    Seq(
      md5(text).as("k"),
      wordCount(text).cast("long").as("nw"),
      (Text.langId(text) =!= "und").as("b1"),
      (wordCount(text) >= 20 && wordCount(text) <= 100000).as("b2"),
      (round(Text.qualityScore(text), 6) >= 0.5).as("b3"),
      (size(array_distinct(lw)) * 10 >= size(lw) * 3).as("b4"))
  }

  /** Cumulative-stage funnel totals over flagged rows (b1..b5 plus nw):
    * one row, n0..n5 docs and t0..t5 tokens surviving each prefix of
    * the chain. Works identically on a static frame or a stream (where
    * it becomes a complete-mode aggregation with twelve-counter state).
    */
  def funnelAgg(flagged: DataFrame): DataFrame = {
    val stages = Seq(
      lit(true), col("b1"), col("b1") && col("b2"),
      col("b1") && col("b2") && col("b3"),
      col("b1") && col("b2") && col("b3") && col("b4"),
      col("b1") && col("b2") && col("b3") && col("b4") && col("b5"))
    val aggExprs = stages.zipWithIndex.flatMap { case (s, i) => Seq(
      sum(when(s, 1L).otherwise(0L)).as(s"n$i"),
      sum(when(s, col("nw")).otherwise(0L)).as(s"t$i"))
    }
    flagged.agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Streaming funnel over a document stream (needs a `text` column).
    * Exact duplicates share their text, so every row of an md5 group
    * carries identical flags and "first occurrence" needs no ordering
    * — the claim bit is the only state.
    */
  def funnelStream(docs: DataFrame,
                   stateTtl: Option[java.time.Duration] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val flagged = docs.select(flagCols(col("text")): _*).as[DocFlags]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val withFirst = flagged.groupByKey(_.k)
      .flatMapGroupsWithState[Boolean, FlagsFirst](
        OutputMode.Append(), timeoutConf) {
        (_: String, it: Iterator[DocFlags], state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toList
            val claimed = state.exists
            state.update(true)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            rows.zipWithIndex.map { case (r, i) =>
              FlagsFirst(r.nw, r.b1, r.b2, r.b3, r.b4, !claimed && i == 0)
            }.iterator
          }
      }
    funnelAgg(withFirst.toDF())
  }

  /** Batch mirror over a static frame — the parity baseline the spec
    * compares the stream against. First-occurrence rank order within
    * an md5 group is irrelevant (identical text ⇒ identical flags), so
    * any deterministic one-per-key marking matches the stream.
    */
  def funnelBatch(docs: DataFrame): DataFrame = {
    val flagged = docs.select(flagCols(col("text")): _*)
    val w = Window.partitionBy(col("k")).orderBy(col("k"))
    funnelAgg(flagged.withColumn("b5", row_number().over(w) === 1))
  }
}
