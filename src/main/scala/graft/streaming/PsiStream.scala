package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming PSI drift — the stateful form of the batch
  * `Drift.psiReport`: a live stream of observations accumulates
  * per-bin (reference, current) counts and the drift report is
  * recomputable after every micro-batch, without rescanning history.
  * Completes the batch↔stream parity set (MinHash, heavy hitters,
  * KMV).
  *
  * Contract difference vs batch: the batch report derives its bin
  * edges from the COMBINED observed min/max; a stream cannot know
  * the future range, so edges (`mn`, `mx`, `bins`) are FIXED up
  * front — in production the reference window's observed range, in
  * the parity spec the batch-computed range, making the two reports
  * bit-identical ([[binOf]] replays the batch bin arithmetic in the
  * same IEEE shape, [[psiTerms]] the same floor/ln/round-6 term).
  *
  * Shape: observations key by bin id — at most `bins` groups, each
  * holding two BIGINT counters, updated by flatMapGroupsWithState;
  * state is O(bins) forever. Each batch a touched bin re-emits its
  * counts tagged with `version` = observations seen by that bin
  * (monotone); "current report" = max-version row per bin.
  */
object PsiStream {

  /** One observation: side 0 = reference, 1 = current. */
  final case class Obs(side: Int, v: Double)
  final case class BinRow(bin: Long, version: Long,
                          n_ref: Long, n_cur: Long)

  /** Per-bin state (public for the state-store encoder). */
  final case class BinCounts(seen: Long, nRef: Long, nCur: Long)

  /** The batch binning arithmetic (Drift.binnedCounts) on plain
    * doubles: same expression shape, same IEEE result.
    */
  def binOf(v: Double, mn: Double, mx: Double, bins: Int): Long =
    if (mx == mn) 0L
    else math.min((bins - 1).toLong,
      math.max(0L, math.floor((v - mn) / (mx - mn) * bins).toLong))

  def psiStream(in: Dataset[Obs], mn: Double, mx: Double,
                bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    import in.sparkSession.implicits._
    in.filter(o => !o.v.isNaN)
      .groupByKey(o => binOf(o.v, mn, mx, bins))
      .flatMapGroupsWithState[BinCounts, BinRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bin: Long, rows: Iterator[Obs], state) =>
          val prev = state.getOption.getOrElse(BinCounts(0L, 0L, 0L))
          var seen = prev.seen
          var nRef = prev.nRef
          var nCur = prev.nCur
          rows.foreach { o =>
            seen += 1
            if (o.side == 0) nRef += 1 else nCur += 1
          }
          val upd = BinCounts(seen, nRef, nCur)
          state.update(upd)
          Iterator(BinRow(bin, seen, nRef, nCur))
      }.toDF()
  }

  /** Spark's round(x.cast(DECIMAL(18,8)), 6).cast(double) — the
    * two-step HALF_UP the batch report applies to each term.
    */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, RoundingMode.HALF_UP)
      .setScale(6, RoundingMode.HALF_UP)
      .doubleValue()

  /** PSI terms from the merged per-bin counts — the identical
    * arithmetic as Drift.psiReport: probabilities floored at
    * `floorP`, term = (p_cur − p_ref)·ln(p_cur/p_ref), round-6.
    * Total PSI = sum of terms.
    */
  def psiTerms(counts: Seq[(Long, Long, Long)],
               floorP: Double = 1e-6): Seq[(Long, Long, Long, Double)] = {
    val tr = counts.map(_._2).sum.toDouble
    val tc = counts.map(_._3).sum.toDouble
    counts.sortBy(_._1).map { case (bin, nRef, nCur) =>
      val pr = math.max(nRef.toDouble / tr, floorP)
      val pc = math.max(nCur.toDouble / tc, floorP)
      (bin, nRef, nCur, r6((pc - pr) * math.log(pc / pr)))
    }
  }
}
