package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca

/** PCA/whitening: recovers a planted anisotropic basis, produces
  * orthonormal sign-pinned components, whitens to unit variance, and
  * is bit-identical under repartitioning (the decimal-sum covariance
  * contract).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic embeddings: x = a·e0·3 + b·e1·1 (+ tiny
  // structured residue on e2) in a rotated 4-dim space — the top two
  // principal directions and variances are known by construction
  private def rows(n: Int): Seq[(Long, Seq[Double])] = {
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    (1 to n).map { i =>
      val a = ((lcg(i.toLong) >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 6.0
      val b = ((lcg(i.toLong * 31) >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2.0
      val c = ((lcg(i.toLong * 97) >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 0.2
      // basis: e0 = (1,1,0,0)/√2, e1 = (1,-1,0,0)/√2, e2 = (0,0,1,0)
      val r2 = math.sqrt(2.0)
      (i.toLong, Seq(a / r2 + b / r2, a / r2 - b / r2, c, 0.0))
    }
  }

  test("pcaFit recovers the planted basis, orthonormal and sign-pinned") {
    val df = rows(4000).toDF("id", "emb")
    val m = Pca.pcaFit(df, "emb", k = 3)
    assert(m.n == 4000 && m.dim == 4)
    // eigenvalues descending, dominated by the planted 3.0/1.0/0.1
    // component scales (variance of uniform(-w/2, w/2) = w²/12)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(1) > m.eigenvalues(2))
    assert(math.abs(m.eigenvalues(0) - 36.0 / 12 / 2 * 2) < 0.3) // ≈ 3.0
    // top component ≈ ±(1,1,0,0)/√2 with sign pinned positive
    val q0 = m.components(0)
    assert(math.abs(math.abs(q0(0)) - 1 / math.sqrt(2)) < 0.02, q0.toSeq)
    assert(q0(0) > 0, "sign pin must make the pivot coordinate positive")
    // orthonormality
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 4).map(t => m.components(i)(t) * m.components(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"q$i . q$j = $dot")
    }
  }

  test("whitened output has unit variance per component, zero mean") {
    val df = rows(4000).toDF("id", "emb")
    val m = Pca.pcaFit(df, "emb", k = 2)
    val w = Pca.pcaWhiten(df, "id", "emb", m)
    val stats = w.select(
        expr("aggregate(whitened, 0d, (s, x) -> s + x) / size(whitened)").as("rowmean"),
        col("whitened")(0).as("w0"), col("whitened")(1).as("w1"))
      .agg(avg(col("w0")).as("m0"), stddev_pop(col("w0")).as("s0"),
        avg(col("w1")).as("m1"), stddev_pop(col("w1")).as("s1"))
      .head()
    assert(math.abs(stats.getDouble(0)) < 1e-6, "component 0 mean")
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-3, "component 0 std")
    assert(math.abs(stats.getDouble(2)) < 1e-6, "component 1 mean")
    assert(math.abs(stats.getDouble(3) - 1.0) < 1e-3, "component 1 std")
  }

  test("fit is bit-identical under repartitioning") {
    val df = rows(1500).toDF("id", "emb")
    val a = Pca.pcaFit(df.repartition(13), "emb", k = 2)
    val b = Pca.pcaFit(df.coalesce(1), "emb", k = 2)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.mean.toSeq == b.mean.toSeq)
  }

  test("incremental maintenance: merged batch moments equal the full rescan fit bit-for-bit") {
    val all = rows(3000)
    val (h1, h2) = all.splitAt(1700) // deliberately uneven batches
    val full = Pca.pcaFit(all.toDF("id", "emb"), "emb", k = 3)
    val m1 = Pca.pcaMoments(h1.toDF("id", "emb"), "emb")
    val m2 = Pca.pcaMoments(h2.toDF("id", "emb"), "emb")
    val merged = Pca.pcaFromMoments(Pca.mergeMoments(m1, m2), k = 3)
    // exact decimal sums are associative: merge ≡ rescan, no epsilon
    assert(merged.n == full.n)
    assert(merged.mean.toSeq == full.mean.toSeq)
    assert(merged.eigenvalues.toSeq == full.eigenvalues.toSeq)
    assert(merged.components.map(_.toSeq).toSeq ==
      full.components.map(_.toSeq).toSeq)
    // merge is symmetric
    val swapped = Pca.pcaFromMoments(Pca.mergeMoments(m2, m1), k = 3)
    assert(swapped.components.map(_.toSeq).toSeq ==
      full.components.map(_.toSeq).toSeq)
  }
}
