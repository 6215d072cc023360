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
}
