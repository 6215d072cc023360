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

  /** Per-bin drift report: (bin, n_ref, n_cur, psi_term) ordered by
    * bin — total PSI is the sum of psi_term. Bins span the COMBINED
    * observed [min, max] so both sides always bin identically.
    */
  def psiReport(ref: DataFrame, cur: DataFrame, valueCol: String,
                bins: Int = 10, floorP: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    require(floorP > 0 && floorP < 1, s"floorP out of (0, 1): $floorP")
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
    val counts = binned.groupBy(col("__bin").as("bin"))
      .agg(count(when(col("__side") === 0, 1)).as("n_ref"),
        count(when(col("__side") === 1, 1)).as("n_cur"))
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
}
