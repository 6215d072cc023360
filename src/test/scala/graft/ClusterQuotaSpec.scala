package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity.clusterQuotaSample invariants: exact sqrt quotas, full
  * per-cell delivery, and partitioning-independent member selection.
  */
class ClusterQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, sfDir, "embeddings")
  private def cents = emb.where(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("embedding").as("cemb"))

  test("every cell delivers exactly ceil(sqrt(n_cell)) members") {
    val out = Similarity.clusterQuotaSample(emb, "vec_id", "embedding", cents)
      .groupBy(col("cell"), col("n_cell"), col("quota"))
      .agg(count(lit(1)).as("selected"), max(col("rn")).as("max_rn"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (cell, nCell, quota, selected, maxRn) =>
      assert(quota == math.ceil(math.sqrt(nCell.toDouble)).toLong, s"cell $cell")
      assert(selected == quota, s"cell $cell delivered $selected of $quota")
      assert(maxRn == quota)
    }
  }

  test("selection is partitioning-independent (detHash rank, not data order)") {
    val a = Similarity.clusterQuotaSample(emb, "vec_id", "embedding", cents)
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet
    val b = Similarity.clusterQuotaSample(
        emb.repartition(13, col("label")), "vec_id", "embedding", cents)
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("sqrt allocation flattens: big cells are cut harder than small ones") {
    val rates = Similarity.clusterQuotaSample(emb, "vec_id", "embedding", cents)
      .groupBy(col("cell"), col("n_cell")).agg(count(lit(1)).as("k"))
      .as[(Long, Long, Long)].collect()
      .map { case (_, n, k) => (n, k.toDouble / n) }
    val big = rates.maxBy(_._1)
    val small = rates.minBy(_._1)
    if (big._1 > 4 * small._1) // only meaningful with real size spread
      assert(big._2 < small._2,
        s"big cell keep-rate ${big._2} not below small ${small._2}")
  }
}
