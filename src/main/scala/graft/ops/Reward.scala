package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reward post-processing for preference/RL data pipelines.
  *
  * [[groupNormalizedAdvantage]] is the group-relative advantage
  * transform (GRPO — Shao et al. 2024, arXiv:2402.03300 §4.1: for a
  * group of rewards, A_i = (r_i − mean)/(std + ε)); the groups here
  * are any key (prompt id, source, …). Engineering: per-group moments
  * as DECIMAL sums of the 6-decimal reward — exact and
  * order-independent, so mean and variance are bit-identical across
  * engines and partitionings — aggregated to ≤|groups| rows and
  * broadcast-joined back: the data itself never shuffles.
  *
  * [[pairwiseWins]]/[[btStrengths]] aggregate per-item scores into a
  * pairwise-preference ranking via Bradley–Terry (Bradley & Terry
  * 1952; MM fit per Hunter 2004). The full pairwise win matrix
  * W[a][b] = #{i∈a, j∈b : r_i > r_j} + ½·ties is computed WITHOUT
  * materializing the O(n²) pairs: per-(group, value) counts + a
  * per-group prefix sum over the value grid give each win count as a
  * rank statistic (the Mann–Whitney U identity), so the cost is
  * O(V·G²) rows where V ≤ 10^6+1 is bounded by the 6-decimal reward
  * granularity — scale-independent. Wins are integer-and-half valued
  * (exact in doubles below 2^52), so the matrix is bit-identical
  * across engines; the G×G MM solve runs on the driver in fixed
  * iterations (bounded driver state, the BPE-merge precedent).
  */
object Reward {

  /** Adds `advantageCol` = round((r − μ_g)/(σ_g + eps), 6). `rewardCol`
    * must already be rounded to ≤6 decimals (it is cast to
    * DECIMAL(18,6) for the exact moment sums). σ is the population
    * std. Plan: one ≤|groups|-row aggregate + a broadcast join back.
    */
  def groupNormalizedAdvantage(df: DataFrame, groupCol: String,
                               rewardCol: String, eps: Double = 1e-4,
                               advantageCol: String = "advantage"): DataFrame = {
    val d = col(rewardCol).cast(DecimalType(18, 6))
    val moments = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(d).as("__s1"),
        sum(d * d).as("__s2"))
      .select(col("__g"),
        (col("__s1").cast("double") / col("__n")).as("__mu"),
        sqrt(greatest(
          col("__s2").cast("double") / col("__n")
            - (col("__s1").cast("double") / col("__n"))
              * (col("__s1").cast("double") / col("__n")),
          lit(0.0))).as("__sigma"))
    df.join(broadcast(moments), col(groupCol) === col("__g"))
      .withColumn(advantageCol,
        round((col(rewardCol) - col("__mu")) / (col("__sigma") + lit(eps)), 6))
      .drop("__g", "__mu", "__sigma")
  }

  /** The G×G pairwise win matrix from per-item scores, as rows
    * (a, b, wins) for a ≠ b:
    * wins = #{i∈a, j∈b : r_i > r_j} + 0.5·#{ties}
    * (so wins(a,b) + wins(b,a) = n_a·n_b, the comparison count the
    * MM fit needs). Computed via per-(group, value) counts and
    * a per-group prefix sum over the shared value grid — never the
    * O(n²) pair stream. Scores should be pre-rounded (bounded V).
    */
  def pairwiseWins(df: DataFrame, groupCol: String,
                   scoreCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("__grp"),
        col(scoreCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    // dense (value × group) grid so prefix sums see every value
    val values = counts.select(col("__v")).distinct()
    val groups = counts.select(col("__grp")).distinct()
    val grid = values.crossJoin(broadcast(groups))
      .join(counts, Seq("__v", "__grp"), "left")
      .na.fill(0L, Seq("__c"))
    val w = Window.partitionBy(col("__grp")).orderBy(col("__v"))
    val prefixed = grid.withColumn("__below",
      coalesce(sum(col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val a = counts.select(col("__grp").as("a"), col("__v"),
      col("__c").as("__na"))
    val b = prefixed.select(col("__grp").as("b"), col("__v"),
      col("__c").as("__nb"), col("__below"))
    a.join(b, Seq("__v"))
      .where(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("__na") * (col("__below").cast("double")
        + col("__nb").cast("double") * 0.5)).as("wins"))
  }

  /** Driver-side Bradley–Terry MM fit over a collected win matrix
    * (`pairwiseWins` output — ≤ G² rows). Fixed `iters` MM updates
    * from the uniform start, normalized to sum 1 each round:
    * p_i ← W_i / Σ_j n_ij/(p_i + p_j). Returns (group, strength)
    * sorted by group; strengths are raw doubles — round before
    * cross-engine comparison.
    */
  def btStrengths(wins: Seq[(String, String, Double)],
                  iters: Int = 10): Seq[(String, Double)] = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val groups = wins.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = groups.zipWithIndex.toMap
    val g = groups.size
    val w = Array.ofDim[Double](g, g) // w(i)(j) = wins of i over j
    wins.foreach { case (a, b, v) => w(idx(a))(idx(b)) = v }
    val wTot = Array.tabulate(g)(i => w(i).sum)
    var p = Array.fill(g)(1.0 / g)
    for (_ <- 0 until iters) {
      val next = Array.tabulate(g) { i =>
        var denom = 0.0
        var j = 0
        while (j < g) {
          if (j != i) {
            val nij = w(i)(j) + w(j)(i)
            if (nij > 0) denom += nij / (p(i) + p(j))
          }
          j += 1
        }
        if (denom > 0) wTot(i) / denom else p(i)
      }
      val s = next.sum
      p = next.map(_ / s)
    }
    groups.zip(p.toSeq)
  }
}
