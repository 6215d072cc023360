package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding PCA + whitening — the standard conditioning step before
  * cosine/IVF work on learned embeddings (anisotropic dimensions
  * dominate distances; whitening equalizes them; published retrieval
  * pipelines whiten before product quantization for exactly this
  * reason).
  *
  * Scale split: the d×d second-moment matrix is computed DISTRIBUTED
  * (one mergeable imperative aggregate — [[graft.expressions.
  * OuterProductSumAgg]] — whose partial state IS the d(d+1)/2 + d
  * decimal sums, so the exchange carries one ~d²·17-byte buffer per
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

  /** The sufficient statistics of a PCA fit: row count plus the d
    * first-moment and d(d+1)/2 upper-triangle second-moment EXACT
    * decimal sums. Because they are exact sums, moments are MERGEABLE
    * with plain addition — a corpus split any way and re-merged yields
    * bit-identical moments, hence a bit-identical model
    * ([[mergeMoments]]; spec-pinned). That is the incremental
    * contract: each ingest batch computes its own buffer (one scan),
    * and the corpus model refreshes by merging buffers — the
    * embedding-space form of `incremental_agg_merge`.
    */
  final case class PcaMoments(n: Long, d: Int,
                              sums: IndexedSeq[java.math.BigDecimal])

  /** One-scan moment aggregate over `embCol` (array<double> or
    * castable): the distributed half of the fit, reusable as an
    * incremental buffer.
    */
  def pcaMoments(emb: DataFrame, embCol: String): PcaMoments = {
    val e = emb.select(col(embCol).cast("array<double>").as("__x"))
      .where(col("__x").isNotNull && size(col("__x")) > 0)
    val d = e.select(size(col("__x"))).head().getInt(0)
    // ONE mergeable imperative aggregate carries all d + d(d+1)/2
    // decimal sums as its partial state — the earlier posexplode
    // formulation shuffled d(d+1)/2 rows per input row (4.3M exchange
    // rows at sf0.1/d=64, a top-5 bench query); the exchange now
    // ships one ~d²·17-byte buffer per partition. Per-term decimal
    // arithmetic is identical (valueOf → setScale(18, HALF_UP) → add,
    // matching sum(cast(v AS DECIMAL(38,18)))), so the fit stays
    // bit-identical to the explode form under any partitioning —
    // ragged dimensions throw inside the aggregate.
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val row = e.agg(
      column(graft.expressions.OuterProductSumAgg(expression(col("__x"))))
        .as("s")).head().getStruct(0)
    PcaMoments(row.getLong(0), d,
      row.getSeq[java.math.BigDecimal](1).toIndexedSeq)
  }

  /** Exact decimal merge: moments(A ∪ B) = merge(moments(A),
    * moments(B)) bit-for-bit (decimal addition is associative and
    * commutative — no floating point anywhere in the buffer).
    */
  def mergeMoments(a: PcaMoments, b: PcaMoments): PcaMoments = {
    require(a.d == b.d, s"dimension mismatch: ${a.d} vs ${b.d}")
    require(a.sums.size == b.sums.size, "moment buffer size mismatch")
    PcaMoments(a.n + b.n, a.d,
      a.sums.zip(b.sums).map { case (x, y) => x.add(y) })
  }

  /** Fit top-`k` principal components of `embCol` (array<double> or
    * castable). `powerIters` bounds each component's power iteration;
    * 100 is far past convergence for any spectral gap worth using.
    */
  def pcaFit(emb: DataFrame, embCol: String, k: Int,
             powerIters: Int = 100): PcaModel =
    pcaFromMoments(pcaMoments(emb, embCol), k, powerIters)

  /** The driver half of the fit: eigensolve over a moment buffer —
    * rescanned or merged, the model is the same function of the exact
    * sums.
    */
  def pcaFromMoments(mom: PcaMoments, k: Int,
                     powerIters: Int = 100): PcaModel = {
    require(k >= 1, s"k must be >= 1: $k")
    val d = mom.d
    require(k <= d, s"k ($k) exceeds embedding dim ($d)")
    val n = mom.n
    require(n > 0, "pcaFit: no rows")
    val sums = mom.sums
    val mean = new Array[Double](d)
    (0 until d).foreach(i => mean(i) = sums(i).doubleValue() / n)
    val m2 = Array.ofDim[Double](d, d) // E[x xᵀ]
    var k2 = d
    for (i <- 0 until d; j <- i until d) {
      val s = sums(k2).doubleValue() / n
      m2(i)(j) = s; m2(j)(i) = s
      k2 += 1
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
