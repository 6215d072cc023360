package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Windowed trending top-k over an event stream — the streaming form
  * of the batch `events_trending_daily` report (per-day counts →
  * top-k by (count desc, type)).
  *
  * State is one Misra–Gries candidate buffer PER event-time window
  * (shared `offer` step with [[HeavyHittersStream]] so the batch
  * sketch, the global stream, and this windowed form cannot drift):
  * O(windows · capacity) entries total, independent of event volume.
  * When `capacity` ≥ the window's distinct-type count the buffer IS
  * the exact count map and the emitted ranking equals the batch
  * report exactly (spec-asserted); below that it degrades along the
  * standard MG guarantee (any type with frequency > seen/capacity is
  * retained, counts under-estimate by ≤ seen/capacity).
  *
  * Emission is Append-mode versioned candidates (version = events
  * absorbed by that window so far): consumers take the max-version
  * rows per window for the current ranking — same contract as
  * [[HeavyHittersStream]]. For unbounded retention pass `stateTtl`;
  * a window stops updating one watermark-delay after it closes, so a
  * processing-time TTL on the ORDER of the lateness horizon bounds
  * the store at (TTL / window) · capacity entries.
  */
object TrendingStream {

  final case class EventIn(ts: Timestamp, event_type: String)
  final case class WindowTop(window_start: Timestamp, version: Long,
                             event_type: String, mg_count: Long)

  def trendingStream(events: Dataset[EventIn], windowMs: Long,
                     capacity: Int,
                     stateTtl: Option[java.time.Duration] = None)
      : DataFrame = {
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .filter(e => e.event_type != null && e.ts != null)
      .groupByKey(e =>
        e.ts.getTime - java.lang.Math.floorMod(e.ts.getTime, windowMs))
      .flatMapGroupsWithState[HeavyHittersStream.GroupState, WindowTop](
        OutputMode.Append(), timeoutConf) {
        (wstart: Long, it: Iterator[EventIn], state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = mutable.HashMap.empty[String, Long]
            var seen = 0L
            state.getOption.foreach { s =>
              buf ++= s.counts
              seen = s.seen
            }
            it.foreach { e =>
              HeavyHittersStream.offer(buf, capacity, e.event_type, 1L)
              seen += 1
            }
            state.update(HeavyHittersStream.GroupState(seen, buf.toMap))
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            val version = seen
            buf.toSeq.sortBy { case (t, c) => (-c, t) }
              .map { case (t, c) =>
                WindowTop(new Timestamp(wstart), version, t, c)
              }.iterator
          }
      }
      .toDF()
  }

  /** Current per-window top-k from the emitted candidate rows —
    * bounded input (≤ windows·capacity live rows after max-version
    * filtering), usable anywhere.
    */
  def currentTopK(rows: Seq[WindowTop], k: Int)
      : Map[Timestamp, Seq[(String, Long)]] =
    rows.groupBy(_.window_start).map { case (w, rs) =>
      val latest = rs.map(_.version).max
      w -> rs.filter(_.version == latest)
        .sortBy(r => (-r.mg_count, r.event_type))
        .take(k)
        .map(r => (r.event_type, r.mg_count))
    }
}
