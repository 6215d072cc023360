package graft

import org.apache.spark.sql.functions._

/** dedup_chain_audit on CONSTRUCTED corpora: the gated corpus's
  * clusters are all clean (sf0.01/sf0.1: every cluster chained=0), so
  * this spec is what exercises the detection paths.
  *
  * Chained case: a = block X, b = X ++ Y, c = Y — a shares X with b,
  * b shares Y with c, a and c share NOTHING. The CC cluster {a, b, c}
  * exists only by chaining; keep-one-per-cluster would delete a
  * document with similarity 0 to the survivor. The audit must report
  * min pairwise Jaccard 0 ⇒ chained=1 (the 0 comes through the
  * coalesce path: the a–c pair never reaches the shingle-hash join).
  * The banding of the a–b / b–c pairs (J ≈ 0.47 each) is a
  * deterministic function of these fixed texts and constants —
  * verified to fire for this token salt, pinned here.
  *
  * Clean control: two identical docs cluster at J = 1 ⇒ chained=0.
  */
class ChainAuditSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("chain").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("dedup_chain_audit")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
  }

  test("a chained a~b~c cluster is flagged with min pairwise sim 0") {
    val x = (0 until 40).map(i => s"xa$i")
    val y = (0 until 40).map(i => s"ya$i")
    val out = run(Seq(
      1L -> x.mkString(" "),
      2L -> (x ++ y).mkString(" "),
      3L -> y.mkString(" ")))
    assert(out == Seq((3L, 1L, 1L, 0.0)),
      s"expected one chained 3-cluster: $out")
  }

  test("an exact-duplicate cluster is clean (chained=0, min sim 1)") {
    val t = (0 until 40).map(i => s"tok$i").mkString(" ")
    val out = run(Seq(1L -> t, 2L -> t))
    assert(out == Seq((2L, 0L, 1L, 1.0)),
      s"expected one clean 2-cluster: $out")
  }
}
