package graft

/** JL projection distortion: the k=16 sign projection should preserve
  * pairwise distances in the aggregate (mean ratio near 1, most pairs
  * inside the ±30% band) — the property that makes the compressed
  * store usable for retrieval at all.
  */
class EmbeddingJlSpec extends SparkSpec {
  import spark.implicits._

  test("distance ratios center on 1 and concentrate within the JL band") {
    val r = SparkEntry.queries("embedding_jl_distortion")(spark, sfDir)
      .as[(Long, Double, Double, Double, Double)].collect().head
    val (nPairs, mean, mn, mx, frac) = r
    assert(nPairs > 100)
    assert(mean > 0.85 && mean < 1.15, s"mean ratio $mean")
    assert(frac > 0.75, s"frac within 30%: $frac")
    assert(mn > 0.0 && mx < 3.0)
  }
}
