package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding PCA + whitening — the standard conditioning step before
  * cosine/IVF work on learned embeddings (anisotropic dimensions
  * dominate distances; whitening equalizes them; published retrieval
  * pipelines whiten before product quantization for exactly this
  * reason).
  *
  * Scale split: the d×d second-moment matrix is computed DISTRIBUTED
  * (one explode of the upper triangle per row → hash aggregate on
  * (i, j) — the shuffle carries d(d+1)/2 + d partial sums per
  * partition, never rows), while the eigendecomposition runs on the
  * DRIVER over the d×d matrix — d is the embedding width (64 here,
  * ≤ a few thousand in practice), so driver memory is d², bounded and
  * tiny; this is the same driver-bounded-model contract as
  * [[Similarity.kmeansFit]]'s centroid set.
  *
  * Determinism: every distributed sum is a DECIMAL(38,18) sum of
  * exactly-cast per-row products — addition-order-independent, so the
  * covariance (and therefore the whole eigen chain, a fixed IEEE
  * sequence on the driver) is bit-identical under any partitioning.
  * Power iteration starts from a FIXED seed vector (1, 1/2, …, 1/d),
  * runs a fixed iteration count, and deflates — no randomness
  * anywhere. Sign convention: each component's largest-|coordinate|
  * entry is made positive (eigenvectors are sign-ambiguous; pinning
  * the sign makes results comparable across runs and engines).
  */
object Pca {

  final case class PcaModel(n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def k: Int = eigenvalues.length
  }

  private val SumDec = DecimalType(38, 18)

  /** Fit top-`k` principal components of `embCol` (array<double> or
    * castable). `powerIters` bounds each component's power iteration;
    * 100 is far past convergence for any spectral gap worth using.
    */
  def pcaFit(emb: DataFrame, embCol: String, k: Int,
             powerIters: Int = 100): PcaModel = {
    require(k >= 1, s"k must be >= 1: $k")
    val e = emb.select(col(embCol).cast("array<double>").as("__x"))
      .where(col("__x").isNotNull && size(col("__x")) > 0)
    val d = e.select(size(col("__x"))).head().getInt(0)
    require(k <= d, s"k ($k) exceeds embedding dim ($d)")
    // Upper triangle as a FLAT positional explode — no per-element
    // struct construction (the named-struct form measured ~2× the
    // whole fit); pos decodes to (i, j) on the driver. Mean sums ride
    // a second, d-element explode of the raw vector.
    def sumsByPos(df: DataFrame): Array[(Int, java.math.BigDecimal, Long)] =
      df.groupBy(col("pos"))
        .agg(sum(col("v").cast(SumDec)).as("s"), count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getDecimal(1), r.getLong(2)))
    val covSums = sumsByPos(e.select(posexplode(expr(
      s"""flatten(transform(sequence(0, ${d - 1}), i ->
         |  transform(sequence(i, ${d - 1}), j -> __x[i] * __x[j])))"""
        .stripMargin)).as(Seq("pos", "v"))))
    val meanSums = sumsByPos(
      e.select(posexplode(col("__x")).as(Seq("pos", "v"))))
    val n = meanSums.headOption.map(_._3).getOrElse(0L)
    require(n > 0, "pcaFit: no rows")
    require(meanSums.forall(_._3 == n) && covSums.forall(_._3 == n),
      "pcaFit: ragged embedding dimensions")
    val mean = new Array[Double](d)
    meanSums.foreach { case (i, s, _) => mean(i) = s.doubleValue() / n }
    val m2 = Array.ofDim[Double](d, d) // E[x xᵀ]
    // pos → (i, j): row-major over the upper triangle
    val posIJ = (for (i <- 0 until d; j <- i until d) yield (i, j)).toArray
    covSums.foreach { case (pos, sDec, _) =>
      val (i, j) = posIJ(pos)
      val s = sDec.doubleValue() / n
      m2(i)(j) = s; m2(j)(i) = s
    }
    val cov = Array.tabulate(d, d)((i, j) => m2(i)(j) - mean(i) * mean(j))
    // driver-side deterministic power iteration with deflation
    val eigenvalues = new Array[Double](k)
    val components = Array.ofDim[Double](k, d)
    for (c <- 0 until k) {
      var v = Array.tabulate(d)(i => 1.0 / (i + 1))
      var it = 0
      while (it < powerIters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += cov(i)(j) * v(j); j += 1 }
          w(i) = s; i += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = if (nrm > 0) w.map(_ / nrm) else v
        it += 1
      }
      var lam = 0.0
      for (i <- 0 until d; j <- 0 until d) lam += v(i) * cov(i)(j) * v(j)
      // sign pin: largest-|coordinate| entry positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val signed = if (v(pivot) < 0) v.map(-_) else v
      eigenvalues(c) = lam
      components(c) = signed
      for (i <- 0 until d; j <- 0 until d)
        cov(i)(j) -= lam * signed(i) * signed(j)
    }
    PcaModel(n, mean, eigenvalues, components)
  }

  /** Project + whiten: returns (idCol, `whitened` array<double> of
    * length model.k) where component c is
    * (x − μ)·q_c / sqrt(λ_c + eps). A pure scan-time projection — the
    * model rides the plan as literals, nothing shuffles.
    */
  def pcaWhiten(emb: DataFrame, idCol: String, embCol: String,
                model: PcaModel, eps: Double = 1e-9): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val x = col(embCol).cast("array<double>")
    val comps = (0 until model.k).map { c =>
      val q = model.components(c)
      val dotQ = column(graft.expressions.DotProduct(
        expression(x), expression(typedLit(q.toSeq))))
      val meanDot = (0 until model.dim).map(i => model.mean(i) * q(i)).sum
      (dotQ - lit(meanDot)) / lit(math.sqrt(model.eigenvalues(c) + eps))
    }
    emb.select(col(idCol), array(comps: _*).as("whitened"))
  }
}
