package graft

import org.apache.spark.sql.functions._
import graft.ops.LinearProbe

/** LinearProbe: one-pass sufficient statistics + driver GD. Pins the
  * math (closed-form first step, monotone descent, exact optimum on
  * noiseless data) and the scale contract (moments invariant under
  * repartitioning — the decimal sums are partition-order-free).
  */
class ProbeSpec extends SparkSpec {

  import spark.implicits._

  private def feats = Seq(
    expr("CAST(1 AS DECIMAL(18,6))"),
    expr("CAST(CAST(x1 AS DECIMAL(20,0)) * CAST(0.1 AS DECIMAL(8,6)) AS DECIMAL(18,6))"),
    expr("CAST(CAST(x2 AS DECIMAL(20,0)) * CAST(0.01 AS DECIMAL(8,6)) AS DECIMAL(18,6))"))

  private def df = (1 to 40)
    .map(i => (i.toLong % 7, (i * i).toLong % 13, if (i % 3 == 0) 1 else 0))
    .toDF("x1", "x2", "y")

  test("step 1 equals the closed form eta*b/n and mse descends monotonically") {
    val (n, a, b, syy) = LinearProbe.moments(df, feats,
      expr("CAST(y AS DECIMAL(18,6))"))
    val steps = LinearProbe.gdSteps(a, b, syy, n, eta = 0.2, steps = 5)
    assert(steps.size == 6)
    val s1 = steps(1)
    for (j <- b.indices)
      assert(s1.w(j) == 0.0 - 0.2 * ((0.0 - b(j)) / n),
        s"closed-form step-1 weight $j")
    val mses = steps.map(_.mse)
    assert(mses.head == syy / n)
    for (t <- 1 until mses.size)
      assert(mses(t) < mses(t - 1), s"mse must strictly decrease at step $t")
  }

  test("noiseless linear labels: descent heads to zero loss") {
    // y = 0.5*f1 exactly (as a double after the decimal scan) — the
    // optimum has mse 0; five steps must cut mse by well over half.
    val lin = df.withColumn("yl",
      expr("CAST(CAST(x1 AS DECIMAL(20,0)) * CAST(0.05 AS DECIMAL(8,6)) AS DECIMAL(18,6))"))
    val (n, a, b, syy) = LinearProbe.moments(lin, feats, col("yl"))
    val steps = LinearProbe.gdSteps(a, b, syy, n, eta = 0.5, steps = 200)
    assert(steps.last.mse < steps.head.mse * 0.05,
      s"expected >20x loss reduction, got ${steps.head.mse} -> ${steps.last.mse}")
    val mses = steps.map(_.mse)
    for (t <- 1 until mses.size)
      assert(mses(t) <= mses(t - 1), s"descent must be monotone at step $t")
  }

  test("fit output is invariant under repartitioning") {
    val y = expr("CAST(y AS DECIMAL(18,6))")
    val names = Seq("w_bias", "w_1", "w_2")
    val one = LinearProbe.fit(spark, df, feats, y, names, 0.2, 3).collect()
    val many = LinearProbe.fit(spark, df.repartition(7), feats, y, names,
      0.2, 3).collect()
    assert(one.toSeq == many.toSeq)
  }

  test("ridgeExact solves the normal equations: residual ~0, lambda=0 mse " +
    "is the global minimum, mse monotone in lambda") {
    val y = expr("CAST(y AS DECIMAL(18,6))")
    val names = Seq("w_bias", "w_1", "w_2")
    val lambdas = Seq(0.0, 0.05, 0.5)
    val rows = LinearProbe.ridgeExact(spark, df, feats, y, names, lambdas)
      .collect()
    assert(rows.map(_.getDouble(0)).toSeq == lambdas)
    val (n, a, b, _) = LinearProbe.moments(df, feats, y)
    rows.foreach { r =>
      val lam = r.getDouble(0)
      val w = names.indices.map(j => r.getDouble(j + 1))
      // (A + nλI)w − b ≈ 0 relative to |b| (w is rounded to 6dp,
      // so the residual bar is loose, not machine-epsilon)
      for (j <- b.indices) {
        val aw = b.indices.map(k =>
          (a(j)(k) + (if (j == k) n * lam else 0.0)) * w(k)).sum
        assert(math.abs(aw - b(j)) < 1e-3 * (math.abs(b(j)) + 1.0),
          s"normal-equation residual at lambda=$lam row $j: $aw vs ${b(j)}")
      }
    }
    // λ=0 closed form is the least-squares optimum: no GD path can
    // beat it, and more shrinkage can only raise the unpenalized mse
    val mses = rows.map(r => r.getDouble(r.length - 1))
    val gdFinal = LinearProbe.gdSteps(a, b,
      LinearProbe.moments(df, feats, y)._4, n, 0.2, 50).last.mse
    assert(mses(0) <= gdFinal + 1e-9,
      s"exact lambda=0 mse ${mses(0)} must not exceed GD mse $gdFinal")
    for (t <- 1 until mses.length)
      assert(mses(t) >= mses(t - 1) - 1e-9,
        s"unpenalized mse must be nondecreasing in lambda at $t")
  }
}
