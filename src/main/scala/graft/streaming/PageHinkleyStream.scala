package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Page–Hinkley drift monitor — the online form of
  * [[graft.ops.Drift.pageHinkley]], and the reason that statistic is
  * worth carrying next to the offline CUSUM changepoint: PH_t is a
  * function of (t, Σy, m_t, min m) ONLY, so a per-group state of four
  * fixed-width numbers replays the batch recursion exactly on an
  * unbounded series. State is O(groups), independent of stream length.
  *
  * Exactness: the metric arrives as exact micros (the 6-decimal
  * contract: y DECIMAL(18,6) × 10⁶ as long); sums and the running
  * minimum stay in integer micros; the one IEEE division per row
  * (S_t/t) and its round-6 re-quantization replicate the batch
  * operator's expression shape bit-for-bit (the PsiStream r6 rule:
  * Spark's round(cast(x, DECIMAL(18,8)), 6) is HALF_UP at 8 then 6
  * places). The parity spec asserts stream ≡ batch rows across
  * micro-batch boundaries.
  *
  * Ordering contract: the statistic is defined by series order, so
  * rows within a micro-batch are sorted by `orderK` before replay and
  * ACROSS batches the caller must deliver in order (a daily-rollup
  * stream is naturally ordered; out-of-order delivery needs the
  * watermark audit's lateness bound first — see
  * `events_watermark_audit`).
  */
object PageHinkleyStream {

  /** One series point: group, order key (e.g. epoch day), exact
    * metric in micros (y · 10⁶ as long — the DECIMAL(18,6) contract).
    */
  final case class SeriesObs(g: String, orderK: Long, micros: Long)

  final case class PhRow(g: String, orderK: Long, i: Long,
                         ph: Double, alarm: Boolean)

  /** Per-group state (public for the state-store encoder). */
  final case class PhState(n: Long, sumMicros: Long,
                           mMicros: Long, minMicros: Long)

  /** Spark's round(x.cast(DECIMAL(18,8)), 6) on a double, returned in
    * exact micros.
    */
  private def r6Micros(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, RoundingMode.HALF_UP)
      .setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  private def microsToDouble(m: Long): Double =
    java.math.BigDecimal.valueOf(m).movePointLeft(6).doubleValue()

  def pageHinkleyStream(in: Dataset[SeriesObs], lambda: Double)
      : DataFrame = {
    import in.sparkSession.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[PhState, PhRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[SeriesObs], state) =>
          var st = state.getOption.getOrElse(PhState(0L, 0L, 0L, 0L))
          val out = Seq.newBuilder[PhRow]
          // batch-internal order is the series order; the slice is one
          // micro-batch's worth of points for this group — bounded
          it.toSeq.sortBy(_.orderK).foreach { o =>
            val n = st.n + 1
            val s = st.sumMicros + o.micros
            // term_t = round6(y_t − S_t/t): same IEEE shape as batch
            val raw = microsToDouble(o.micros) -
              microsToDouble(s) / n.toDouble
            val m = st.mMicros + r6Micros(raw)
            // prefix min INCLUDES the current row (first row: PH = 0)
            val minM = if (st.n == 0L) m else math.min(st.minMicros, m)
            st = PhState(n, s, m, minM)
            val ph = microsToDouble(m - minM)
            out += PhRow(g, o.orderK, n, ph, ph > lambda)
          }
          state.update(st)
          out.result().iterator
      }.toDF()
  }
}
