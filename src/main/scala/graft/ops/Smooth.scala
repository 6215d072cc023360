package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recency-weighted smoothing over ordered per-group series — the
  * adjusted, span-capped EWMA (pandas `ewm(adjusted=True)` truncated
  * at [[EwmaLags]] lags): l_t = Σⱼ βʲ·y_{t−j} / Σⱼ βʲ over the
  * observed rows present in the window. The truncation is what makes
  * the recursion a FIXED lag chain instead of unbounded state: both
  * engines (and the streaming twin) evaluate the same
  * [[EwmaLags]]-term left-associated numerator/denominator, one IEEE
  * shape, no recursive re-quantization needed — the dropped tail
  * beyond lag 7 carries < 6 % of the mass at β = 0.7.
  *
  * Scale shape: one sorted window pass per group with [[EwmaLags]]
  * `lag`s — O(1) per-row state, the events_moving_avg_7d contract
  * with recency weighting. Streaming twin:
  * [[graft.streaming.EwmaStream]] (bit-exact parity, spec-pinned).
  */
object Smooth {

  val EwmaBeta = 0.7
  val EwmaLags = 8

  /** βʲ as the EXACT doubles of repeated multiplication — shared by
    * the batch window expression, the streaming twin's replay, and
    * (as shortest-round-trip literals) the SQL oracle.
    */
  val EwmaWeights: IndexedSeq[Double] =
    (1 until EwmaLags).scanLeft(1.0)((acc, _) => acc * EwmaBeta)
      .toIndexedSeq

  /** Adjusted span-capped EWMA of `yCol` (a round-6 double) per
    * `gCol` group in `ordCol` order. Output: the three input columns
    * plus `n_lags` (observed rows in the window) and `ewma`
    * (round-6 through the DECIMAL(18,8) guard).
    */
  def ewmaAdjusted(df: DataFrame, gCol: String, ordCol: String,
                   yCol: String): DataFrame = {
    val w = Window.partitionBy(col(gCol)).orderBy(col(ordCol))
    def lagJ(j: Int): Column =
      if (j == 0) col(yCol) else lag(col(yCol), j).over(w)
    val num = (0 until EwmaLags).foldLeft(null: Column) {
      case (acc, j) =>
        val term = lit(EwmaWeights(j)) * coalesce(lagJ(j), lit(0.0))
        if (acc == null) term else acc + term
    }
    val den = (0 until EwmaLags).foldLeft(null: Column) {
      case (acc, j) =>
        val term = when(lagJ(j).isNotNull, lit(EwmaWeights(j)))
          .otherwise(lit(0.0))
        if (acc == null) term else acc + term
    }
    val nl = (0 until EwmaLags).map(j =>
      when(lagJ(j).isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    df.select(col(gCol), col(ordCol), col(yCol),
      nl.as("n_lags"),
      round((num / den).cast(org.apache.spark.sql.types.DecimalType(18, 8)),
        6).cast("double").as("ewma"))
  }
}
