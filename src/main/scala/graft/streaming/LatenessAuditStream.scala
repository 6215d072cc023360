package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming watermark-lateness audit — the online form of the batch
  * `events_watermark_audit`: how out-of-order is each stream,
  * measured as event-time regression against the running maximum in
  * arrival order. This is the monitor you run BEFORE (and while)
  * trusting any `withWatermark(delay)`: the batch query answers it
  * offline; this keeps the answer current on the live stream with
  * O(1) state per group — (count, running-max event time, max
  * lateness, three threshold counters) — no history retained.
  *
  * The recursion is the batch query's exactly (late_i = max over
  * arrival-prefix of event time − event time_i, all integer micros),
  * so the final per-group row equals the batch aggregate on the same
  * data bit-for-bit — parity spec-pinned across micro-batch splits.
  * The batch form additionally reports an exact p95 (an integer-rank
  * order statistic needs the distribution); online, pipe `late_us`
  * into [[KllStream]] for a bounded-state p95 with a known rank
  * error — the counters here are the exact part.
  *
  * Ordering contract: rows are sorted by `seq` (the per-group arrival
  * sequence, e.g. a Kafka partition offset) within each micro-batch;
  * across batches the caller delivers in arrival order — which is the
  * one ordering a real ingest pipeline has by construction.
  */
object LatenessAuditStream {

  /** One observation: group (shard), arrival sequence, event-time
    * in integer microseconds.
    */
  final case class ArrivalObs(g: String, seq: Long, us: Long)

  /** Per-group audit row; `version` = rows absorbed (monotone), so
    * the current report is the max-version row per group.
    */
  final case class AuditRow(g: String, version: Long, n_events: Long,
                            max_late_us: Long, c1m: Long, c10m: Long,
                            c1h: Long)

  final case class AuditState(n: Long, maxUs: Long, maxLateUs: Long,
                              c1m: Long, c10m: Long, c1h: Long)

  private val M1 = 60L * 1000000L
  private val M10 = 600L * 1000000L
  private val H1 = 3600L * 1000000L

  def latenessAuditStream(in: Dataset[ArrivalObs]): DataFrame = {
    import in.sparkSession.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[AuditState, AuditRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[ArrivalObs], state) =>
          var st = state.getOption
            .getOrElse(AuditState(0L, Long.MinValue, 0L, 0L, 0L, 0L))
          // arrival order within the batch is the statistic's
          // definition — the slice is one micro-batch's rows, bounded
          it.toSeq.sortBy(_.seq).foreach { o =>
            val late = if (st.n == 0L || o.us >= st.maxUs) 0L
                       else st.maxUs - o.us
            st = AuditState(st.n + 1,
              math.max(st.maxUs, o.us),
              math.max(st.maxLateUs, late),
              st.c1m + (if (late > M1) 1L else 0L),
              st.c10m + (if (late > M10) 1L else 0L),
              st.c1h + (if (late > H1) 1L else 0L))
          }
          state.update(st)
          Iterator.single(AuditRow(g, st.n, st.n, st.maxLateUs,
            st.c1m, st.c10m, st.c1h))
      }.toDF()
  }
}
