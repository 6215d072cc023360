package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.ops.Smooth

/** Streaming twin of [[graft.ops.Smooth.ewmaAdjusted]] — the online
  * recency-weighted monitor. The span cap is what bounds the state:
  * an adjusted EWMA truncated at L lags is a function of the last
  * L − 1 observations ONLY, so per-group state is a ≤(L−1)-element
  * ring of exact micros — O(groups · L), independent of stream
  * length (an UNcapped adjusted EWMA would need the full history; the
  * recursive form would need re-quantization to stay engine-exact —
  * the cap avoids both).
  *
  * Exactness: values arrive as exact micros (the 6-decimal contract);
  * each emit replays the batch window expression's EXACT IEEE chain —
  * same Σ wⱼ·coalesce(lag, 0) fold order, same weight doubles from
  * [[Smooth.EwmaWeights]], same round(cast(DECIMAL(18,8)), 6) guard —
  * so stream rows equal batch rows bit-for-bit (parity spec-pinned
  * across micro-batch splits and checkpoint restart).
  *
  * Ordering contract: same as PageHinkleyStream — rows within a
  * micro-batch are sorted by `orderK`; across batches the caller
  * delivers in order (daily rollups are naturally ordered).
  */
object EwmaStream {

  /** One series point: group, order key (e.g. epoch day), exact
    * metric in micros (y · 10⁶ as long — the DECIMAL(18,6) contract).
    */
  final case class SeriesObs(g: String, orderK: Long, micros: Long)

  final case class EwmaRow(g: String, orderK: Long, y: Double,
                           n_lags: Long, ewma: Double)

  /** Per-group state: the last ≤(EwmaLags−1) micros, most recent
    * FIRST (public for the state-store encoder).
    */
  final case class EwmaState(recent: Seq[Long])

  private def microsToDouble(m: Long): Double =
    java.math.BigDecimal.valueOf(m).movePointLeft(6).doubleValue()

  /** Spark's round(x.cast(DECIMAL(18,8)), 6).cast(double). */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, RoundingMode.HALF_UP)
      .setScale(6, RoundingMode.HALF_UP)
      .doubleValue()

  def ewmaStream(in: Dataset[SeriesObs]): DataFrame = {
    import in.sparkSession.implicits._
    val L = Smooth.EwmaLags
    val w = Smooth.EwmaWeights
    in.groupByKey(_.g)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[SeriesObs], state) =>
          var recent = state.getOption.map(_.recent.toVector)
            .getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[EwmaRow]
          it.toSeq.sortBy(_.orderK).foreach { o =>
            // lag j: j = 0 is the current row, j ≥ 1 reads the ring —
            // the same fold ORDER and operand shapes as the batch
            // window expression (w*coalesce(lag,0), left-associated)
            var num = 0.0
            var den = 0.0
            var nl = 0L
            var first = true
            for (j <- 0 until L) {
              val lagV: Option[Long] =
                if (j == 0) Some(o.micros)
                else if (j - 1 < recent.size) Some(recent(j - 1))
                else None
              val numTerm = w(j) * lagV.map(microsToDouble).getOrElse(0.0)
              val denTerm = if (lagV.isDefined) w(j) else 0.0
              if (first) { num = numTerm; den = denTerm; first = false }
              else { num = num + numTerm; den = den + denTerm }
              if (lagV.isDefined) nl += 1
            }
            out += EwmaRow(g, o.orderK, microsToDouble(o.micros), nl,
              r6(num / den))
            recent = (o.micros +: recent).take(L - 1)
          }
          state.update(EwmaState(recent))
          out.result().iterator
      }.toDF()
  }
}
