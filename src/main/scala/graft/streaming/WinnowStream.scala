package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming winnow-fingerprint near-dup gate — the arrival-order
  * twin of the dedup_winnow_pairs machinery (reference corpus flow
  * apps/etl/etl_slimpajama_dc_proc.py:119-166 is the same
  * query-then-insert sequential pass, over MinHash; winnowing adds
  * the LOCAL guarantee: any shared ≥ w+k−1-word run fires).
  *
  * Contract: a document is flagged iff ≥ `minShared` of its selected
  * fingerprints were already CLAIMED by earlier documents when it
  * arrived — the ≥2 bar makes a single 43-bit hash collision unable
  * to flag a doc, the same reasoning as the batch pairs query.
  * Within a micro-batch a fingerprint's claim is lowest-doc-id-wins
  * (the MinHashStream convention, so a one-batch run reproduces the
  * batch arrival order); across batches the earlier batch's claim
  * wins regardless of id.
  *
  * Streaming shape: per-row fingerprint selection (WinnowOps — the
  * same kernel the batch column rides, bit-identical hashes) →
  * flatMapGroupsWithState keyed by fingerprint (state = one claim
  * flag, O(1) per distinct fingerprint) → per-doc sum of
  * prior-claimed hits. The state store grows with distinct
  * fingerprints — ~2/(w+1) of the corpus gram count, the winnow
  * density dividend vs a shingle-keyed index — and `stateTtl` bounds
  * it with the standard dedup-window trade (an expired claim makes a
  * later duplicate first-seen).
  */
object WinnowStream {

  final case class DocIn(doc_id: Long, text: String)
  final case class FpHit(fp: Long, doc_id: Long)
  final case class FpVerdict(doc_id: Long, prior: Int)

  /** Append-mode per-(fingerprint, doc) verdict stage — the stateful
    * half alone, file-sinkable for checkpoint-restart coverage (an
    * unbounded aggregation cannot run in Append mode).
    */
  def winnowVerdictStream(docs: Dataset[DocIn], k: Int = 4, w: Int = 8,
                          stateTtl: Option[java.time.Duration] = None): Dataset[FpVerdict] = {
    import docs.sparkSession.implicits._
    // capture hash mode on the driver at plan build (batch discipline)
    val xx = graft.functions.GraftFunctions.hashModeIsXx
    val hits = docs.flatMap { d =>
      graft.expressions.WinnowOps.selectHashes(d.text, k, w, xx)
        .map(FpHit(_, d.doc_id))
    }
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    hits
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, FpVerdict](
        OutputMode.Append(), timeoutConf) {
        (_: Long, it: Iterator[FpHit], state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = it.map(_.doc_id).toSeq.distinct.sorted
            val out =
              if (state.exists) ids.map(FpVerdict(_, 1))
              else FpVerdict(ids.head, 0) +: ids.tail.map(FpVerdict(_, 1))
            state.update(true)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.iterator
          }
      }
  }

  def winnowDedupStream(docs: Dataset[DocIn], k: Int = 4, w: Int = 8,
                        minShared: Long = 2L,
                        stateTtl: Option[java.time.Duration] = None): DataFrame =
    winnowVerdictStream(docs, k, w, stateTtl)
      .groupBy(col("doc_id"))
      .agg(sum(col("prior")).as("n_prior"))
      .withColumn("flagged",
        (col("n_prior") >= minShared).cast("int"))

  /** The batch formulation of the same arrival-order contract (doc_id
    * = arrival order): n_prior = how many of a doc's fingerprints are
    * also held by some lower-id doc — the parity oracle the stream
    * spec checks against, and a plain batch operator in its own
    * right (one fingerprint-keyed min + one doc-keyed sum).
    */
  def winnowDedupBatch(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 4, w: Int = 8,
                       minShared: Long = 2L): DataFrame = {
    val fps = docs.select(col(idCol).as("doc_id"),
      explode(graft.ops.Text.winnowHashes(col(textCol), k, w)).as("fp"))
    val firsts = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("__first"))
    fps.join(firsts, "fp")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("doc_id") > col("__first"), 1L).otherwise(0L))
        .as("n_prior"))
      .withColumn("flagged", (col("n_prior") >= minShared).cast("int"))
  }
}
