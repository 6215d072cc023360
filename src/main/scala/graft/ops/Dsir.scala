package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import graft.functions.GraftFunctions

/** DSIR-style data selection — importance resampling over hashed
  * n-gram features (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling", arXiv:2302.03169; the method
  * behind domain-targeted pretraining mixes). Given a TARGET slice of
  * the corpus (docs matching a predicate — a seed domain, a language,
  * a high-quality source) and the full corpus as the PROPOSAL:
  *
  *  1. hash every lowercase whitespace token into `buckets` buckets
  *     (mode-selected 60-bit hash — md5 for DuckDB-oracle parity,
  *     xxhash64 in production);
  *  2. estimate both distributions as add-α-smoothed bucket
  *     frequencies — ONE aggregation over a token scan produces both
  *     (target ⊆ proposal, counted with count + conditional count),
  *     and its output is ≤ `buckets` rows (bounded driver state, the
  *     Quantile-histogram precedent);
  *  3. per-document log importance weight = Σ_tokens
  *     log p̂_target[b(t)] − log p̂_proposal[b(t)], computed by the
  *     codegen'd [[graft.expressions.BucketScore]] expression in ONE
  *     corpus scan — no explode, no join, no shuffle;
  *  4. select top-k by weight plus (optionally) seeded Gumbel noise —
  *     Gumbel-top-k sampling ≡ sampling without replacement with
  *     probability ∝ exp(weight), the paper's sampling rule, made
  *     deterministic (and oracle-expressible) by deriving the uniform
  *     from the seeded document-id hash.
  *
  * At 100 TB: two corpus scans total (count pass + score pass), one
  * `buckets`-row aggregate, one top-k (TakeOrdered — never a global
  * sort). The ratio table rides into codegen as a reference array.
  */
object Dsir {

  /** The bucketed log-likelihood-ratio table: index b holds
    * log((ct_b+α)/(Tt+αB)) − log((cp_b+α)/(Tp+αB)). Buckets unseen in
    * the proposal get the all-α ratio (only reachable when scoring a
    * corpus other than the proposal).
    */
  def ratioTable(docs: DataFrame, textCol: String, isTarget: Column,
                 buckets: Int, alpha: Double): Array[Double] = {
    require(buckets > 0 && alpha > 0, s"need buckets>0, alpha>0: $buckets, $alpha")
    val counts = docs
      .select(isTarget.cast("boolean").as("__t"),
        explode(split(lower(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
      .select(pmod(GraftFunctions.hash60(col("__w")), lit(buckets.toLong)).as("__b"),
        col("__t"))
      .groupBy("__b")
      .agg(count(lit(1)).as("__cp"),
        count(when(col("__t"), lit(1))).as("__ct"))
      .collect() // ≤ buckets rows

    var tt = 0L
    var tp = 0L
    counts.foreach { r => tp += r.getLong(1); tt += r.getLong(2) }
    val aB = alpha * buckets
    def ratio(ct: Long, cp: Long): Double =
      math.log((ct + alpha) / (tt + aB)) - math.log((cp + alpha) / (tp + aB))
    val table = Array.fill(buckets)(ratio(0L, 0L))
    counts.foreach { r =>
      table(r.getLong(0).toInt) = ratio(r.getLong(2), r.getLong(1))
    }
    table
  }

  /** Adds the raw per-document log importance weight (`weightCol`,
    * DOUBLE; round before comparing across engines). One scan.
    */
  def weights(docs: DataFrame, textCol: String, isTarget: Column,
              buckets: Int, alpha: Double,
              weightCol: String = "dsir_weight"): DataFrame = {
    val table = ratioTable(docs, textCol, isTarget, buckets, alpha)
    withScore(docs, textCol, table, weightCol)
  }

  /** Scores `docs` against a prebuilt table (the cross-corpus path:
    * fit the table on one corpus, score another).
    */
  def withScore(docs: DataFrame, textCol: String, table: Array[Double],
                weightCol: String): DataFrame =
    docs.withColumn(weightCol, GraftColumnBridge.column(
      graft.expressions.BucketScore(
        GraftColumnBridge.expression(col(textCol)),
        table.toSeq, GraftFunctions.hashModeIsXx)))

  /** Top-k selection. `gumbelSeed = None`: deterministic top-k by
    * rounded weight (greedy — the "argmax" variant). `Some(seed)`:
    * Gumbel-top-k, i.e. weight + Gumbel(0,1) noise with the uniform
    * derived from hash(seed:id) — the paper's importance-resampling
    * rule, reproducible across engines and retries. `selKeyCol` is
    * the rounded ranking key (ties broken by id ascending).
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
             isTarget: Column, buckets: Int, alpha: Double, k: Int,
             gumbelSeed: Option[Long] = None,
             weightCol: String = "dsir_weight",
             selKeyCol: String = "sel_key"): DataFrame = {
    val w = weights(docs, textCol, isTarget, buckets, alpha, weightCol)
    val key = gumbelSeed match {
      case Some(seed) =>
        // u in (0,1): (h mod 2^52 + 0.5) / 2^52 — exactly representable,
        // never 0 or 1; g = -ln(-ln(u)) ~ Gumbel(0,1)
        val m = 4503599627370496L // 2^52
        val u = (pmod(GraftFunctions.md5Long(
          concat(lit(s"$seed:"), col(idCol).cast("string"))), lit(m))
          .cast("double") + lit(0.5)) / lit(m.toDouble)
        col(weightCol) - log(-log(u))
      case None => col(weightCol)
    }
    w.withColumn(selKeyCol, round(key, 6))
      .withColumn(weightCol, round(col(weightCol), 6))
      .orderBy(col(selKeyCol).desc, col(idCol))
      .limit(k)
  }
}
