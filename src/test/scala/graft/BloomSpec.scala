package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** Bloom-prefilter invariants: no false negatives (the property that
  * makes antiJoinBloom exact), bounded false positives, codegen'd
  * probe, and equivalence with the plain anti join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("fit/mightContain: every inserted key probes true; fpp stays bounded") {
    val known = spark.range(0, 1000)
      .select(concat(lit("key-"), col("id")).as("k"))
    val filter = Bloom.fit(known, col("k"), expectedItems = 1000, fpp = 0.03)
    val misses = known.where(!Bloom.mightContain(filter, col("k"))).count()
    assert(misses == 0, "bloom filters must have no false negatives")
    val fresh = spark.range(0, 10000)
      .select(concat(lit("other-"), col("id")).as("k"))
    val falsePos = fresh.where(Bloom.mightContain(filter, col("k"))).count()
    // 3% nominal; 5x headroom keeps the assertion hash-seed-proof
    assert(falsePos < 1500, s"false-positive rate too high: $falsePos/10000")
  }

  test("mightContain works on long keys and under CODEGEN_ONLY") {
    val known = spark.range(0, 500).toDF("id")
    val filter = Bloom.fit(known, col("id"), expectedItems = 500, fpp = 0.01)
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFall = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val hits = spark.range(0, 500)
        .where(Bloom.mightContain(filter, col("id"))).count()
      assert(hits == 500)
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFall.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("antiJoinBloom equals the plain anti join") {
    val left = spark.range(0, 2000)
      .select(col("id"), concat(lit("fp-"), col("id") % 700).as("fp"))
    val right = spark.range(0, 350)
      .select(concat(lit("fp-"), col("id")).as("known_fp"))
    val viaBloom = Bloom.antiJoinBloom(left, "fp", right, "known_fp",
        expectedItems = 350, fpp = 0.03)
      .select("id").as[Long].collect().toSet
    val plain = left.join(right, col("fp") === col("known_fp"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(viaBloom == plain)
    assert(plain.nonEmpty && plain.size < 2000) // both branches exercised
  }

  test("prefilter effectiveness: might-contain fraction ≈ dup share + fpp, " +
    "so the join shuffle shrinks to that fraction") {
    // 100k-row "crawl", 10% true dups of a 50k-key known corpus: the
    // measured bypass rate is the scale evidence — only the
    // might-contain sliver (true dups + ~fpp false positives) reaches
    // the exact anti-join shuffle
    val n = 100000L
    val dupShare = 0.10
    val fpp = 0.01
    val known = spark.range(0, 50000)
      .select(concat(lit("k-"), col("id")).as("key"))
    val crawl = spark.range(0, n).select(
      when(col("id") % 10 === 0,
          concat(lit("k-"), org.apache.spark.sql.functions.expr("id div 10")))
        .otherwise(concat(lit("new-"), col("id"))).as("key"))
    val filter = Bloom.fit(known, col("key"), expectedItems = 50000, fpp)
    val nMaybe = crawl
      .where(Bloom.mightContain(filter, col("key"))).count()
    val maybeFrac = nMaybe.toDouble / n
    // lower bound: every true dup must probe true (no false negatives)
    assert(maybeFrac >= dupShare, s"false negatives? $maybeFrac")
    // upper bound: dups + fpp with 3x headroom on the fpp term
    assert(maybeFrac <= dupShare + 3 * fpp,
      s"prefilter not selective: $maybeFrac")
  }
}
