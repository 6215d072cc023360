package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming counterparts of the batch operators (reference
  * ST1-ST3: the single-pass corpus processor with mutable cross-row
  * state, apps/etl/etl_slimpajama_dc_proc.py:115-166).
  *
  * The batch equivalents (dropDuplicates + LSH join) are semantically
  * cleaner and preferred for backfills (SURVEY §2.8); these exist for
  * true incremental ingestion: watermarked streaming dedup, event-time
  * windowed aggregation, and explicit keyed state via
  * flatMapGroupsWithState for gap-based sessions.
  */
object Streams {

  /** ST1/A3 — streaming exact dedup: state (the seen-set) is bounded
    * by the watermark horizon instead of growing forever like the
    * reference's in-memory set.
    */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Event-time tumbling window aggregation with late-data handling —
    * the streaming mirror of EventQueries.events_hourly_window.
    */
  def windowedCounts(df: DataFrame, tsCol: String, windowLength: String,
                     watermark: String, keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), windowLength) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("window.start").as("win_start") +: keyCols.map(col) :+ col("n")): _*)

  /** Stream-static enrichment join: each micro-batch joins against the
    * static dimension snapshot (re-read per batch if the source is a
    * file table, so slowly-changing dims pick up updates). At scale
    * the dim side is broadcast per batch when small, shuffle-joined
    * otherwise — same planner rules as batch; no state store involved.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   streamKey: String, dimKey: String): DataFrame =
    stream.join(dim, col(streamKey) === col(dimKey), "left_outer")

  /** Watermarked stream-stream interval join — the streaming
    * impression→click attribution shape (batch mirror:
    * EventQueries.events_asof_attribution). Both sides declare
    * watermarks and the join condition bounds right's event time to
    * [left, left + within], so the state store retains each side only
    * for watermark + within and expired rows are dropped — bounded
    * state at any stream rate, unlike an unconstrained stream-stream
    * join which must buffer forever. Key columns must be distinctly
    * named (Spark cannot disambiguate same-name columns across the
    * two stream sides in a SQL condition).
    */
  def intervalJoin(left: DataFrame, leftTs: String, leftKey: String,
                   right: DataFrame, rightTs: String, rightKey: String,
                   watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
        s"$rightTs >= $leftTs AND $rightTs <= $leftTs + INTERVAL $within"))
  }

  // ---- keyed session state (flatMapGroupsWithState) ----

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(lastTsUs: Long, sessionStartUs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start_us: Long,
                              n_events: Long, closed: Boolean)

  /** Gap-based sessionization with explicit keyed state: events for a
    * user extend the current session unless the gap exceeds
    * `gapSeconds`, in which case the closed session is emitted and a
    * new one starts. State per key is O(1) — at scale the state store
    * holds one small record per active user, not per event.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)
                (implicit enc1: org.apache.spark.sql.Encoder[SessionOut]):
      Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = Seq.newBuilder[SessionOut]
          for (e <- sorted) {
            val us = e.ts.getTime * 1000L
            cur match {
              case Some(s) if us - s.lastTsUs <= gapUs =>
                cur = Some(s.copy(lastTsUs = us, nEvents = s.nEvents + 1))
              case Some(s) =>
                out += SessionOut(user, s.sessionStartUs, s.nEvents, closed = true)
                cur = Some(SessionState(us, us, 1))
              case None =>
                cur = Some(SessionState(us, us, 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
