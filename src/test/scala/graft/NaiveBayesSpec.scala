package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.NaiveBayes

/** Hashed-vocabulary multinomial Naive Bayes: model shape, planted
  * separable corpus accuracy, prior dominance on empty docs, the
  * struct-max tie rule, hash-mode invariance, and the one-scan
  * prediction plan.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // planted two-class corpus with disjoint vocabularies
  private def corpus = spark.range(30).select(
    col("id").as("doc_id"),
    when(col("id") % 3 === 0, lit("aa bb cc dd ee"))
      .otherwise(lit("xx yy zz ww vv")).as("text"),
    when(col("id") % 3 === 0, lit("A")).otherwise(lit("B")).as("label"))

  test("model: sorted classes, exact priors, bucket-sized tables") {
    val m = NaiveBayes.train(corpus, "text", "label", 64, 1.0)
    assert(m.classes == Seq("A", "B"))
    assert(math.abs(m.logPriors.head - math.log(10.0 / 30)) < 1e-12)
    assert(math.abs(m.logPriors(1) - math.log(20.0 / 30)) < 1e-12)
    assert(m.logLik.forall(_.size == 64))
    assert(m.logLik.flatten.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("separable corpus classifies perfectly, one codegen scan, no shuffle") {
    val m = NaiveBayes.train(corpus, "text", "label", 256, 1.0)
    val out = NaiveBayes.predict(m, corpus, "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(plan.contains("*(1) Project"), plan)
    val wrong = out.where(col("predicted") =!= col("label")).count()
    assert(wrong == 0)
  }

  test("empty text falls back to the prior (majority class wins)") {
    val m = NaiveBayes.train(corpus, "text", "label", 64, 1.0)
    val p = NaiveBayes.predict(m,
        Seq((1L, "")).toDF("doc_id", "text"), "text")
      .select("predicted", "nb_score").as[(String, Double)].head()
    assert(p._1 == "B") // prior 2/3
    assert(math.abs(p._2 - math.round(math.log(20.0 / 30) * 1e6) / 1e6) < 1e-9)
  }

  test("exact score ties break toward the greater class name") {
    // equal priors, identical class vocabularies → identical scores
    val even = spark.range(20).select(col("id").as("doc_id"),
      lit("tok tok tok").as("text"),
      when(col("id") % 2 === 0, lit("A")).otherwise(lit("B")).as("label"))
    val m = NaiveBayes.train(even, "text", "label", 64, 1.0)
    val p = NaiveBayes.predict(m, even.limit(1), "text")
      .select("predicted").as[String].head()
    assert(p == "B")
  }

  test("prediction is hash-mode invariant on a separated corpus") {
    val m1 = NaiveBayes.train(corpus, "text", "label", 256, 1.0)
    val md5Pred = NaiveBayes.predict(m1, corpus, "text")
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    spark.conf.set(GraftFunctions.HashModeKey, "xxhash64")
    try {
      val m2 = NaiveBayes.train(corpus, "text", "label", 256, 1.0)
      val xxPred = NaiveBayes.predict(m2, corpus, "text")
        .select("doc_id", "predicted").as[(Long, String)].collect().toMap
      assert(xxPred == md5Pred)
    } finally spark.conf.set(GraftFunctions.HashModeKey, "md5")
  }
}
