package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine linear quality-probe training — the "train a cheap
  * classifier over the corpus" step of a curation pipeline (the
  * fastText/logreg quality-filter recipe), done the way it must be
  * done at 100 TB: the corpus is touched by ONE aggregation pass that
  * collects the sufficient statistics (the Gram matrix A = Σxxᵀ, the
  * moment vector b = Σxy, and Σy²) as decimal-exact sums, and the
  * optimization itself runs on the driver over the d×d moments —
  * O(d²) state, zero additional scans, any number of steps. Compare
  * the naive formulation (one gradient pass over the data PER STEP):
  * for squared loss the gradient is algebraic in the moments,
  * ∇ = (Aw − b)/n, so re-scanning is pure waste. The same pattern as
  * [[Pca.pcaFit]] (covariance moments + driver eigensolve).
  *
  * Cross-engine determinism: features and labels are DECIMAL(18,6)
  * per row, products DECIMAL(37,12), sums exact — both engines see
  * bit-identical moments after the final cast to double. The descent
  * arithmetic is fixed-shape IEEE double (left-associated dot
  * products, the exact expression trees mirrored by the SQL oracle
  * generator in TextQueries), so weights and MSE agree bit-for-bit
  * before the defensive round(6).
  *
  * Reference behavior: quality scoring/filtering over corpus tables
  * (ref `apps/etl/etl_slimpajama_dc_proc.py:140-146` gates on
  * hand-set length thresholds; this operator LEARNS the threshold
  * surface from labels instead).
  */
object LinearProbe {

  /** One GD iterate: weights after `step` updates plus the training
    * MSE at those weights (computed algebraically from the moments).
    */
  final case class ProbeStep(step: Int, w: Seq[Double], mse: Double)

  /** Left-associated dot product — the ONE evaluation order shared
    * with the SQL oracle's `a0*w0 + a1*w1 + …` (SQL `+` parses
    * left-associative), so double rounding is identical.
    */
  private def dotL(a: IndexedSeq[Double], w: IndexedSeq[Double]): Double = {
    var acc = a(0) * w(0)
    var k = 1
    while (k < w.length) { acc = acc + a(k) * w(k); k += 1 }
    acc
  }

  /** Aggregate the sufficient statistics for a linear probe with the
    * given per-row feature columns (must be DECIMAL(18,6) — the
    * caller owns exactness) and label column: returns
    * (n, A full d×d, b, Σy²) as doubles cast from exact decimal sums.
    * One scan, one aggregate row collected — bounded driver state.
    */
  def moments(df: DataFrame, feats: Seq[Column], label: Column)
      : (Double, Array[Array[Double]], Array[Double], Double) = {
    val d = feats.size
    // the exact decimal sums pass through DECIMAL(38,6) BEFORE the
    // double cast: the per-row products carry ≤ 6 fractional digits
    // (features are counts × 10^-k constants), so the cast is
    // LOSSLESS — its only effect is shrinking the unscaled integer
    // below 2^53, where decimal→double conversion is a single
    // correctly-rounded step on BOTH engines. At scale 12 a hostile
    // corpus pushed the unscaled value past 2^53 and DuckDB's
    // int128→double→÷10^12 double-rounding diverged from the JVM's
    // correctly-rounded conversion by an ulp, which three divergent
    // GD steps amplified into a flipped 6th decimal (FUZZ.md seed 3).
    val d6 = org.apache.spark.sql.types.DecimalType(38, 6)
    val aggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
        (for (j <- 0 until d; k <- j until d)
          yield sum(feats(j) * feats(k)).cast(d6).cast("double").as(s"a$j$k")) ++
        (0 until d).map(j =>
          sum(feats(j) * label).cast(d6).cast("double").as(s"b$j")) :+
        sum(label * label).cast(d6).cast("double").as("syy")
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getDouble(0)
    // empty input → NULL decimal sums (getDouble would NPE) and a 0/n
    // division downstream — fail loud like Pca.pcaFromMoments does
    require(n > 0, "LinearProbe.moments: no rows")
    val a = Array.ofDim[Double](d, d)
    var i = 1
    for (j <- 0 until d; k <- j until d) {
      a(j)(k) = row.getDouble(i); a(k)(j) = a(j)(k); i += 1
    }
    val b = Array.tabulate(d)(j => row.getDouble(i + j))
    val syy = row.getDouble(i + d)
    (n, a, b, syy)
  }

  /** Unpenalized training MSE at weights w from the moments:
    * (wᵀAw − 2wᵀb + Σy²)/n in the ONE IEEE shape the SQL oracles
    * spell (per-row dots, then left-associated combination).
    */
  private def mseOf(a: Array[Array[Double]], b: Array[Double], syy: Double,
                    n: Double, w: Array[Double]): Double = {
    val d = b.length
    val dots = Array.tabulate(d)(j => dotL(a(j), w))
    val wAw = dotL(w, dots)
    val wb = dotL(w, b)
    ((wAw - 2 * wb) + syy) / n
  }

  /** Solve Mw = r by Gaussian elimination WITHOUT pivoting, in the
    * exact operation order the unrolled SQL oracle spells: stage k
    * eliminates column k from rows i > k via
    * m(i)(j) − (m(i)(k)/m(k)(k))·m(k)(j) (one division per row,
    * reused across j — bit-identical to the oracle's inlined
    * division, since IEEE division is deterministic on identical
    * operands); back-substitution is a left-associated subtraction
    * chain. No pivoting is safe here BY CONSTRUCTION: callers pass
    * M = A + nλI with A a Gram matrix, so M is positive definite
    * (λ > 0) or generically so (λ = 0, independent features), and
    * every leading principal minor — hence every pivot — is > 0.
    * Destroys its inputs (callers pass copies).
    */
  private def gaussSolve(m: Array[Array[Double]], r: Array[Double])
      : Array[Double] = {
    val d = r.length
    for (k <- 0 until d - 1; i <- k + 1 until d) {
      val f = m(i)(k) / m(k)(k)
      require(!f.isNaN && !f.isInfinite,
        s"gaussSolve: zero pivot at stage $k")
      for (j <- k until d) m(i)(j) = m(i)(j) - f * m(k)(j)
      r(i) = r(i) - f * r(k)
    }
    val w = new Array[Double](d)
    for (j <- d - 1 to 0 by -1) {
      var acc = r(j)
      var k = j + 1
      while (k < d) { acc = acc - m(j)(k) * w(k); k += 1 }
      w(j) = acc / m(j)(j)
    }
    w
  }

  /** CLOSED-FORM ridge path: solve (A + nλI)w = b exactly per λ by
    * [[gaussSolve]] instead of iterating GD — the answer gdSteps
    * approaches as steps → ∞, from the SAME one-scan moments (the λ
    * grid still costs zero extra corpus passes; the solve is O(d³)
    * driver arithmetic). Output matches [[ridgePath]]'s shape:
    * (lambda, <weight columns>, mse — the UNPENALIZED training MSE),
    * one row per λ, through the DECIMAL(18,8)→6 guard. Cross-engine
    * exact because the moments are decimal-exact before the double
    * cast and the elimination/back-substitution expression shapes are
    * mirrored term for term by the unrolled SQL oracle.
    */
  def ridgeExact(spark: SparkSession, df: DataFrame, feats: Seq[Column],
                 label: Column, weightNames: Seq[String],
                 lambdas: Seq[Double]): DataFrame = {
    require(weightNames.size == feats.size, "one name per feature")
    require(lambdas.nonEmpty && lambdas.forall(_ >= 0), s"bad grid: $lambdas")
    val (n, a, b, syy) = moments(df, feats, label)
    val d = b.length
    val rows = lambdas.map { lam =>
      val m = Array.tabulate(d, d) { (i, j) =>
        // λ = 0 keeps the bare aii (no `+ n*0.0` term — mirror the
        // λ-free oracle shape exactly, the gdSteps convention)
        if (i == j && lam != 0.0) a(i)(j) + n * lam else a(i)(j)
      }
      val w = gaussSolve(m, b.clone())
      Row.fromSeq(lam +: w.toSeq :+ mseOf(a, b, syy, n, w))
    }
    val schema = org.apache.spark.sql.types.StructType(
      ("lambda" +: weightNames :+ "mse").map(c => org.apache.spark.sql.types
        .StructField(c, org.apache.spark.sql.types.DoubleType,
          nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .select(col("lambda") +:
        (weightNames.map(c =>
          round(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 8)), 6)
            .cast("double").as(c)) :+ mse6(col("mse")).as("mse")): _*)
      .orderBy(col("lambda"))
  }

  /** Fixed-step gradient descent on the moments: w ← w − η((Aw − b)/n
    * + λw) from w = 0, emitting (step, w, mse) for step 0..steps where
    * mse = (wᵀAw − 2wᵀb + Σy²)/n — the UNPENALIZED training MSE (λ
    * shapes the path, the report shows the fit). λ = 0 (default) is
    * plain least squares; λ > 0 is the ridge path — the standard
    * shrinkage against the probe overfitting a small labeled slice.
    * Pure driver arithmetic — expression shapes mirrored exactly by
    * the SQL oracle.
    */
  def gdSteps(a: Array[Array[Double]], b: Array[Double], syy: Double,
              n: Double, eta: Double, steps: Int,
              lambda: Double = 0.0): Seq[ProbeStep] = {
    val d = b.length
    def mseOf(w: Array[Double]): Double = {
      val dots = Array.tabulate(d)(j => dotL(a(j), w))
      val wAw = dotL(w, dots)
      val wb = dotL(w, b)
      ((wAw - 2 * wb) + syy) / n
    }
    var w = Array.fill(d)(0.0)
    val out = Seq.newBuilder[ProbeStep]
    out += ProbeStep(0, w.toSeq, mseOf(w))
    for (t <- 1 to steps) {
      // λ term OUTSIDE the /n division, mirrored term for term by the
      // oracle's `((dot − b)/n + λ·w)` — one IEEE shape, two engines.
      // λ = 0 keeps the EXACT legacy expression: `x + 0.0·w` is not a
      // bit-level identity (−0.0 + 0.0 = +0.0), and the λ-free oracle
      // spells the λ-free shape.
      w =
        if (lambda == 0.0)
          Array.tabulate(d)(j => w(j) - eta * ((dotL(a(j), w) - b(j)) / n))
        else
          Array.tabulate(d)(j =>
            w(j) - eta * ((dotL(a(j), w) - b(j)) / n + lambda * w(j)))
      out += ProbeStep(t, w.toSeq, mseOf(w))
    }
    out.result()
  }

  /** Ridge regularization path: ONE moments scan, one GD chain per λ
    * (driver algebra on the same d×d moments — the λ grid costs zero
    * extra corpus passes), reporting the final-step weights and the
    * unpenalized training MSE per λ. The standard shrinkage sweep
    * before deploying a probe trained on a small labeled slice: read
    * how fast the weights shrink vs how slowly the fit degrades.
    * Output: (lambda, <weight columns>, mse), one row per λ, all
    * through the DECIMAL(18,8)→6 guard.
    */
  def ridgePath(spark: SparkSession, df: DataFrame, feats: Seq[Column],
                label: Column, weightNames: Seq[String], eta: Double,
                steps: Int, lambdas: Seq[Double]): DataFrame = {
    require(weightNames.size == feats.size, "one name per feature")
    require(lambdas.nonEmpty && lambdas.forall(_ >= 0), s"bad grid: $lambdas")
    val (n, a, b, syy) = moments(df, feats, label)
    val rows = lambdas.map { lam =>
      val last = gdSteps(a, b, syy, n, eta, steps, lam).last
      Row.fromSeq(lam +: last.w :+ last.mse)
    }
    val schema = org.apache.spark.sql.types.StructType(
      ("lambda" +: weightNames :+ "mse").map(c => org.apache.spark.sql.types
        .StructField(c, org.apache.spark.sql.types.DoubleType,
          nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .select(col("lambda") +:
        (weightNames.map(c =>
          round(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 8)), 6)
            .cast("double").as(c)) :+ mse6(col("mse")).as("mse")): _*)
      .orderBy(col("lambda"))
  }

  /** One-scan fit: moments + driver GD, returned as a DataFrame of
    * (step, one column per weight name, mse), all rounded through the
    * session's round(_, 6) for cross-engine display parity.
    */
  /** 6-dp rounding for the REPORTED mse as pure IEEE arithmetic —
    * floor(x·10⁶ + 0.5)/10⁶ — instead of the DECIMAL(18,8) guard the
    * weight columns use. Rationale (FUZZ.md seed 3): a diverging GD
    * path on hostile data pushes mse past 2^53/10⁸ ≈ 9e7, where the
    * engines' double→DECIMAL conversions double-round DIFFERENTLY
    * (JVM BigDecimal is correctly rounded, a binary ×10⁸ is not).
    * This shape is the SAME three correctly-rounded IEEE ops on both
    * engines at ANY magnitude, so identical inputs give identical
    * output bits; mse ≥ 0 so the +0.5 floor is plain half-up.
    *
    * Overflow guard (ADVICE r12): Spark's floor(double) returns
    * BIGINT and SATURATES at Long.MaxValue once mse·10⁶ ≥ 2⁶³, while
    * DuckDB's floor stays DOUBLE — a diverging GD path on hostile
    * data (FUZZ seed-3 regime) would split the engines again. Below
    * |mse| < 9.2e12 the long floor is exact; above it (or non-finite
    * — NaN/±Inf compare false on both engines) the raw double passes
    * through unrounded, identical bits on both sides since the GD
    * arithmetic itself is shape-identical. Mirrored verbatim in the
    * three probe oracles (TextQueries.mse6Sql).
    */
  private def mse6(c: Column): Column =
    when(abs(c) < lit(9.2e12),
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).otherwise(c)

  def fit(spark: SparkSession, df: DataFrame, feats: Seq[Column],
          label: Column, weightNames: Seq[String], eta: Double,
          steps: Int): DataFrame = {
    require(weightNames.size == feats.size, "one name per feature")
    val (n, a, b, syy) = moments(df, feats, label)
    val rows = gdSteps(a, b, syy, n, eta, steps)
      .map(s => Row.fromSeq(s.step.toLong +: s.w :+ s.mse))
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        (weightNames :+ "mse").map(c => org.apache.spark.sql.types
          .StructField(c, org.apache.spark.sql.types.DoubleType,
            nullable = false)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    // round through DECIMAL(18,8) like every other surfaced double —
    // plain round(double, 6) leaves both engines rounding their own
    // binary representation, a 1-ulp tie hazard (ADVICE r9)
    raw.select(col("step") +:
      (weightNames.map(c =>
        round(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 8)), 6)
          .cast("double").as(c)) :+ mse6(col("mse")).as("mse")): _*)
      .orderBy(col("step"))
  }
}
