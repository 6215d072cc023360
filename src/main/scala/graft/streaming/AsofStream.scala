package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the single-pass form of
  * [[graft.ops.Relational.asofJoinNative]]: a tagged union of the
  * dimension-timeline stream (side 0: (key, time, id, value)) and the
  * fact stream (side 1), grouped by key; per-key state is the time-
  * sorted timeline of right rows seen so far, and every fact row is
  * answered by binary search for the largest right time <= its time
  * (tolerance nulls stale matches, exactly the batch rule — consumers
  * filter `matched` for inner semantics).
  *
  * Ordering contract (the MinHashStream/SemDedupStream arrival-order
  * reading): WITHIN a micro-batch rows are processed in
  * (time, side right-first, id) order, so a stream delivered in
  * event-time order reproduces the batch operator exactly under ANY
  * micro-batch slicing (spec-pinned, AsofStreamSpec). ACROSS batches,
  * arrival order is match order: a right row arriving after a fact
  * row never retro-matches it — the real-time "enrich with the latest
  * config seen so far" semantics. Among equal (key, time) right rows
  * the later-processed wins, mirroring the batch supersede rule.
  *
  * State bound: per key, `toleranceUs` prunes entries that can no
  * longer match (older than newest-fact-time − tolerance — assumes
  * per-key monotone fact times, the event-log shape; the newest
  * entry at-or-before the cutoff is retained since it still answers
  * the next lookup), and `maxState` hard-caps the timeline
  * keep-latest. State is O(keys × maxState) regardless of stream
  * length.
  */
object AsofStream {

  /** side 0 = right/timeline row, 1 = left/fact row. */
  final case class AsofEvent(key: Long, timeUs: Long, side: Int,
                             id: Long, value: Double)
  final case class AsofMatch(id: Long, key: Long, timeUs: Long,
                             matched: Boolean, asofTimeUs: Long,
                             matchedId: Long, matchedValue: Double)

  /** (rt, rid, value) entries sorted ascending by rt, plus the
    * largest fact time seen (for tolerance pruning).
    */
  final case class KeyState(times: List[(Long, Long, Double)], maxLt: Long)

  def asofStream(events: Dataset[AsofEvent],
                 toleranceUs: Option[Long] = None,
                 maxState: Int = 4096): Dataset[AsofMatch] = {
    require(maxState >= 1, s"maxState must be >= 1: $maxState")
    toleranceUs.foreach(t => require(t > 0, s"toleranceUs must be positive: $t"))
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[AsofEvent], state) =>
          val st = state.getOption.getOrElse(KeyState(Nil, Long.MinValue))
          // ascending vector of timeline entries for binary search
          val timeline =
            scala.collection.mutable.ArrayBuffer.from(st.times.reverse)
          var maxLt = st.maxLt
          val out = Vector.newBuilder[AsofMatch]
          // right rows first at equal times (<= is inclusive); stable
          // id order makes slicing-invariance exact
          it.toSeq.sortBy(e => (e.timeUs, e.side, e.id)).foreach { e =>
            if (e.side == 0) {
              // mostly-ordered insert: walk back from the tail
              var i = timeline.length
              while (i > 0 && timeline(i - 1)._1 > e.timeUs) i -= 1
              timeline.insert(i, (e.timeUs, e.id, e.value))
            } else {
              maxLt = math.max(maxLt, e.timeUs)
              // rightmost entry with rt <= lt
              var lo = 0
              var hi = timeline.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (timeline(mid)._1 <= e.timeUs) lo = mid + 1 else hi = mid
              }
              val idx = lo - 1
              val ok = idx >= 0 &&
                toleranceUs.forall(t => e.timeUs - timeline(idx)._1 <= t)
              out += (if (ok) {
                val (rt, rid, rv) = timeline(idx)
                AsofMatch(e.id, key, e.timeUs, matched = true, rt, rid, rv)
              } else AsofMatch(e.id, key, e.timeUs, matched = false, 0L, 0L, 0.0))
            }
          }
          // tolerance pruning: anything older than maxLt - tol cannot
          // match a future (monotone) fact time; keep the newest
          // at-or-before the cutoff — it still answers lookups
          var pruned = toleranceUs match {
            case Some(t) if maxLt != Long.MinValue =>
              val cutoff = maxLt - t
              val keepFrom = {
                var lo = 0
                var hi = timeline.length
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (timeline(mid)._1 < cutoff) lo = mid + 1 else hi = mid
                }
                math.max(0, lo - 1)
              }
              timeline.drop(keepFrom)
            case _ => timeline
          }
          if (pruned.length > maxState)
            pruned = pruned.takeRight(maxState)
          // store newest-first so restore's reverse is ascending
          state.update(KeyState(pruned.reverseIterator.toList, maxLt))
          out.result().iterator
      }
  }
}
