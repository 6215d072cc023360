package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.ops.Reward.groupNormalizedAdvantage]] —
  * online per-group reward moments for GRPO-style normalization over
  * an unbounded stream of (group, reward) observations.
  *
  * State per group is THREE scalars — count, Σr, Σr² — so state is
  * O(groups), corpus-size-independent. Exactness: rewards arrive
  * pre-rounded to 6 decimals (the batch operator's contract), are
  * scaled to integers (×10⁶), and the sums are exact BigInt
  * arithmetic — addition is order-independent, so after the stream
  * has absorbed a corpus, μ and σ are BIT-IDENTICAL to the batch
  * operator's DECIMAL-sum moments no matter how micro-batches sliced
  * it (the parity the spec pins). Emission mirrors KllStream: one
  * versioned snapshot row per group per absorbing micro-batch
  * (Append mode, version = n which strictly increases, so
  * (g, version) is unique and max-version consumers are safe);
  * downstream joins the latest (μ, σ) onto new rows to normalize.
  *
  * Contract: |reward| < 10⁶ and rewards carry ≤6 decimals; NaNs are
  * dropped (never absorbed into the moments).
  */
object RewardAdvantageStream {

  final case class Obs(g: String, r: Double)
  final case class GroupMoments(g: String, version: Long, n: Long,
                                mu: Double, sigma: Double)

  /** (n, Σr, Σr²) with the sums as exact integers of the ×10⁶-scaled
    * reward (Σr² is scaled ×10¹²); BigInt serialized as strings so
    * the state encoder stays simple and the arithmetic never
    * truncates.
    */
  final case class MomentState(n: Long, s1: String, s2: String)

  def advantageStream(in: Dataset[Obs]): DataFrame = {
    import in.sparkSession.implicits._
    in.groupByKey(_.g)
      .flatMapGroupsWithState[MomentState, GroupMoments](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[Obs], state) =>
          val st = state.getOption.getOrElse(MomentState(0L, "0", "0"))
          var n = st.n
          var s1 = BigInt(st.s1)
          var s2 = BigInt(st.s2)
          val nBefore = n
          it.foreach { o =>
            if (!o.r.isNaN) {
              // exact: r carries <= 6 decimals, so r*1e6 is integral
              val scaled = BigDecimal(o.r).setScale(6,
                BigDecimal.RoundingMode.HALF_UP).bigDecimal
                .movePointRight(6).toBigIntegerExact
              val v = BigInt(scaled)
              n += 1
              s1 += v
              s2 += v * v
            }
          }
          if (n == nBefore) Iterator.empty
          else {
            state.update(MomentState(n, s1.toString, s2.toString))
            // same double-op sequence as the batch operator:
            // Decimal->double, divide by n, sqrt(max(E[r^2]-mu^2, 0))
            val s1d = BigDecimal(s1, 6).toDouble / n
            val s2d = BigDecimal(s2, 12).toDouble / n
            val sigma = math.sqrt(math.max(s2d - s1d * s1d, 0.0))
            Iterator.single(GroupMoments(g, n, n, s1d, sigma))
          }
      }
      .toDF()
  }
}
