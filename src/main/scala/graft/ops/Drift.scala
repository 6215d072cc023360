package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift monitoring between a reference corpus and a
  * current batch — the production tripwire in front of every
  * continuously-ingested training pipeline ("did this week's crawl
  * shift the feature distribution?").
  *
  * Population Stability Index over equal-width bins:
  *   PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)
  * with probabilities floored at `floorP` so a bin empty on one side
  * contributes a large-but-finite term instead of ±∞. Rule-of-thumb
  * thresholds: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 act.
  *
  * Scale shape: ONE union scan bins both sides (the bin expression is
  * scan-time arithmetic over a broadcast 1-row min/max aggregate — no
  * shuffle of data rows), one O(bins)-state aggregation, and a
  * broadcast 1-row totals join; output is `bins` rows. Nothing about
  * the plan changes between 60 k rows and 100 TB except partition
  * count. Bin edges are plain double arithmetic (identical IEEE
  * rounding in any engine), NULL/NaN values are excluded from both
  * sides, and the per-bin PSI term is decimal-rounded to 6 places so
  * the report is bit-stable cross-engine.
  */
object Drift {

  /** Shared two-sample binning: union both sides tagged 0/1, bin over
    * the COMBINED observed [min, max] (so both sides always bin
    * identically), count per (bin, side). Output is ≤ `bins` rows.
    */
  private def binnedCounts(ref: DataFrame, cur: DataFrame,
                           valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val u = ref.select(col(valueCol).cast("double").as("__v"),
        lit(0).as("__side"))
      .unionByName(cur.select(col(valueCol).cast("double").as("__v"),
        lit(1).as("__side")))
      .where(col("__v").isNotNull && !isnan(col("__v")))
    val st = u.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    // single-value column ⇒ everything is bin 0 (the width expression
    // would be 0/0 = NaN); otherwise clamp the edge value into the
    // last bin
    val binned = u.crossJoin(broadcast(st))
      .withColumn("__bin", when(col("__mx") === col("__mn"), lit(0L))
        .otherwise(least(lit((bins - 1).toLong), greatest(lit(0L),
          floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn")) *
            lit(bins)).cast("long")))))
    binned.groupBy(col("__bin").as("bin"))
      .agg(count(when(col("__side") === 0, 1)).as("n_ref"),
        count(when(col("__side") === 1, 1)).as("n_cur"))
  }

  /** Per-bin drift report: (bin, n_ref, n_cur, psi_term) ordered by
    * bin — total PSI is the sum of psi_term. Bins span the COMBINED
    * observed [min, max] so both sides always bin identically.
    */
  def psiReport(ref: DataFrame, cur: DataFrame, valueCol: String,
                bins: Int = 10, floorP: Double = 1e-6): DataFrame = {
    require(floorP > 0 && floorP < 1, s"floorP out of (0, 1): $floorP")
    val counts = binnedCounts(ref, cur, valueCol, bins)
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val pr = greatest(col("n_ref").cast("double") / col("__tr").cast("double"),
      lit(floorP))
    val pc = greatest(col("n_cur").cast("double") / col("__tc").cast("double"),
      lit(floorP))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(((pc - pr) * log(pc / pr)).cast(DecimalType(18, 8)), 6)
          .cast("double").as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Binned two-sample Kolmogorov–Smirnov report: (bin, n_ref, n_cur,
    * d_term) ordered by bin, where d_term = |CDF_ref(bin) −
    * CDF_cur(bin)| at the bin's upper edge — the KS statistic is
    * max(d_term). Binned KS trades the exact sup over every value for
    * O(bins) aggregation state (the exact statistic needs a global
    * sort over all distinct values — unbounded at 100 TB), the same
    * trade [[psiReport]] makes; `bins` bounds the resolution error at
    * one bin's probability mass.
    *
    * Scale shape: identical to PSI — one union scan bins both sides,
    * one O(bins)-state aggregation; the CDF window runs over ≤ `bins`
    * rows (driver-bounded, not data-bounded). Bins empty on BOTH
    * sides are absent from the report; their CDF is flat there, so
    * max(d_term) is unaffected. Counts stay exact BIGINT; only the
    * final CDF difference is double, decimal-rounded to 6 places for
    * cross-engine bit-stability.
    */
  def ksReport(ref: DataFrame, cur: DataFrame, valueCol: String,
               bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = binnedCounts(ref, cur, valueCol, bins)
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    // unpartitioned window is safe: input is ≤ `bins` rows by
    // construction (the aggregation above collapsed the data)
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(totals))
      .withColumn("__cr", sum(col("n_ref")).over(wCum))
      .withColumn("__cc", sum(col("n_cur")).over(wCum))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(abs(col("__cr").cast("double") / col("__tr").cast("double") -
          col("__cc").cast("double") / col("__tc").cast("double"))
          .cast(DecimalType(18, 8)), 6).cast("double").as("d_term"))
      .orderBy(col("bin"))
  }

  /** Page–Hinkley online drift statistic per group over an ordered
    * metric series (the ONLINE counterpart of the offline CUSUM
    * changepoint: the PH recursion only ever sees the prefix, which is
    * why [[graft.streaming.PageHinkleyStream]] can replay it with
    * O(1) state per group and emit bit-identical rows). Definition:
    *   term_t = y_t − mean(y_1..y_t)   (δ = 0)
    *   m_t    = Σ_{i≤t} term_i,   PH_t = m_t − min_{s≤t} m_s
    * alarm when PH_t > λ. Scale shape: windows over the PRE-AGGREGATED
    * series frame (groups × points, bounded), all sharing one
    * (group, order) sort. Exactness: the prefix sums are exact
    * DECIMAL; the one division per row (S_t/t) happens in IEEE double
    * and its result is immediately re-quantized to DECIMAL(18,6)
    * through the standard (18,8) guard, so m/PH accumulate exactly on
    * both engines and in the sequential stream replay.
    *
    * `yCol` must be DECIMAL(18,6) (the caller owns exactness).
    */
  def pageHinkley(series: DataFrame, gCol: String, orderCol: String,
                  yCol: String, lambda: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(gCol)).orderBy(col(orderCol))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = series
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__s", sum(col(yCol)).over(wRows).cast(DecimalType(28, 6)))
      .withColumn("__term",
        round((col(yCol).cast("double") -
          col("__s").cast("double") / col("__i").cast("double"))
          .cast(DecimalType(18, 8)), 6).cast(DecimalType(18, 6)))
    val withM = base
      .withColumn("__m", sum(col("__term")).over(wRows)
        .cast(DecimalType(28, 6)))
    withM
      .withColumn("__ph", (col("__m") - min(col("__m")).over(wRows))
        .cast(DecimalType(28, 6)))
      .select(col(gCol), col(orderCol), col("__i").as("i"),
        col("__ph").cast("double").as("ph"),
        (col("__ph").cast("double") > lit(lambda)).as("alarm"))
  }
}
