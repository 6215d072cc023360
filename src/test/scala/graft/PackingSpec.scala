package graft

import org.apache.spark.sql.functions._

import graft.ops.Text

/** packHarmonic: the class rule's capacity guarantee, bin counts,
  * shard invariance of fill bounds, and layout determinism.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(lens: Seq[Int]) =
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")

  test("class-k bins hold exactly k docs and never exceed capacity") {
    // lengths chosen so classes 1, 2, 4 populate at capacity 100
    val d = docs(Seq.fill(5)(80) ++ Seq.fill(7)(45) ++ Seq.fill(9)(25))
    val out = Text.packHarmonic(d, "doc_id", "text", capacity = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // k = floor(100/len): 80→1, 45→2, 25→4
    assert(out.keySet == Set(1L, 2L, 4L), s"classes: ${out.keySet}")
    val (n1, b1, _) = out(1L)
    val (n2, b2, _) = out(2L)
    val (n4, b4, t4) = out(4L)
    assert(n1 == 5 && b1 == 5, "class 1: one doc per bin")
    assert(n2 == 7 && b2 == 4, "class 2: ceil(7/2) bins")
    assert(n4 == 9 && b4 == 3, "class 4: ceil(9/4) bins")
    // capacity guarantee: k docs of ≤ C/k tokens each ⇒ any bin's
    // token load ≤ C; the aggregate view of that bound is
    // tok_sum ≤ n_bins · C for every class
    out.foreach { case (k, (_, bins, toks)) =>
      assert(toks <= bins * 100, s"class $k exceeds capacity") }
  }

  test("over-capacity docs are excluded, not broken") {
    val d = docs(Seq(150, 40))
    val out = Text.packHarmonic(d, "doc_id", "text", capacity = 100)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(out == 1L, "the 150-token doc must be routed to chunking")
  }

  test("sharding changes bin granularity, never the capacity bound") {
    val d = docs(Seq.fill(40)(30)) // class 3 at capacity 100
    val one = Text.packHarmonic(d, "doc_id", "text", 100, shards = 1)
      .select(col("n_bins"), col("tok_sum")).head()
    val four = Text.packHarmonic(d, "doc_id", "text", 100, shards = 4)
      .select(col("n_bins"), col("tok_sum")).head()
    assert(one.getLong(0) == 14, s"ceil(40/3): ${one.getLong(0)}")
    // sharding may add ≤ shards−1 partial bins, nothing more
    assert(four.getLong(0) >= 14 && four.getLong(0) <= 17, s"$four")
    assert(four.getLong(1) == one.getLong(1), "token mass unchanged")
  }

  test("the layout is identical under repartitioning") {
    val d = docs((10 to 90 by 7).flatMap(n => Seq.fill(6)(n)))
    val a = Text.packHarmonic(d, "doc_id", "text", 128, shards = 4)
      .select(col("k"), col("assign_sig")).collect().map(_.toString).sorted
    val b = Text.packHarmonic(d.repartition(13), "doc_id", "text", 128,
        shards = 4)
      .select(col("k"), col("assign_sig")).collect().map(_.toString).sorted
    assert(a.sameElements(b), "hash-rank layout must be partition-free")
  }
}
