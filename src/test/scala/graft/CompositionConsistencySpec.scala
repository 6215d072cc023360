package graft

import org.apache.spark.sql.functions._

/** Cross-query accounting: the composed `training_mix_manifest` must
  * tie out against the individually-gated stages it chains, and the
  * incremental dedup must partition its batch exactly — the "do the
  * registered artifacts agree with EACH OTHER" layer on top of the
  * per-query DuckDB gates.
  */
class CompositionConsistencySpec extends SparkSpec {

  test("training_mix_manifest accounts exactly for the curation funnel's survivors") {
    val manifest = SparkEntry.queries("training_mix_manifest")(spark, sfDir)
      .collect()
    val funnelFinal = SparkEntry.queries("curation_funnel")(spark, sfDir)
      .where(col("stage") === "exact_unique").head()
    val nSurvivors = funnelFinal.getLong(2)
    val survivorTokens = funnelFinal.getLong(3)
    // every funnel survivor lands in exactly one (shard, source) cell
    assert(manifest.map(_.getLong(2)).sum == nSurvivors,
      s"manifest docs ${manifest.map(_.getLong(2)).sum} != funnel $nSurvivors")
    // span pruning only ever REMOVES tokens from the survivor mass
    val kept = manifest.map(_.getLong(3)).sum
    assert(kept <= survivorTokens && kept > 0,
      s"tokens_kept $kept vs survivor tokens $survivorTokens")
    // shards are the contiguous curriculum range
    val shards = manifest.map(_.getLong(0)).distinct.sorted
    assert(shards.head == 0L && shards.last < 8L,
      s"unexpected shard ids: ${shards.toSeq}")
    // the α-weighting is positive wherever mass survived
    assert(manifest.filter(_.getLong(3) > 0).forall(_.getDouble(4) > 0.0))
  }

  test("semdedup_incremental partitions the batch half exactly") {
    import graft.functions.GraftFunctions.detHash
    val out = SparkEntry.queries("semdedup_incremental")(spark, sfDir)
      .collect()
    val nBatch = Tables.load(spark, sfDir, "embeddings")
      .where(detHash(2L, col("vec_id")) =!= 0L).count()
    assert(out.length.toLong == nBatch,
      s"one verdict row per batch vector: ${out.length} vs $nBatch")
    val removed = out.count(_.getInt(2) == 1)
    assert(removed >= 0 && removed < out.length,
      s"some batch vectors must survive: $removed of ${out.length}")
  }

  test("retrieval_eval_metrics stays in range and ideal bounds both legs") {
    val rows = SparkEntry.queries("retrieval_eval_metrics")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("dense", "lex"))
    rows.foreach { r =>
      val (dcg, idcg, ndcg, mrr) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(dcg >= 0 && dcg <= idcg + 1e-9, s"DCG must not exceed ideal: $r")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg out of range: $r")
      assert(mrr >= 0.0 && mrr <= 1.0, s"mrr out of range: $r")
    }
  }

  test("retrieval_mmr_topk: unique picks per query, rank-1 is the cosine argmax, and diversification reorders at least one query") {
    val mmr = SparkEntry.queries("retrieval_mmr_topk")(spark, sfDir)
      .select(col("query_id"), col("step"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val perQuery = mmr.groupBy(_._1)
    perQuery.foreach { case (q, picks) =>
      assert(picks.map(_._3).distinct.size == picks.size,
        s"query $q re-picked a neighbor: $picks")
      assert(picks.map(_._2).sorted == (1L to picks.size), s"steps 1..k: $picks")
    }
    val brute = SparkEntry.queries("ann_bruteforce_topk")(spark, sfDir)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val bruteTop = brute.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    perQuery.foreach { case (q, picks) =>
      assert(picks.find(_._2 == 1L).map(_._3) == bruteTop.get(q),
        s"MMR step 1 must be the pure-relevance argmax for query $q")
    }
    // λ < 1 must actually trade relevance for diversity somewhere:
    // at least one query's MMR pick-set differs from its cosine top-k
    val bruteSets = brute.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(_._3).toSet }
    val diverged = perQuery.exists { case (q, picks) =>
      bruteSets.get(q).exists(_ != picks.map(_._3).toSet) }
    assert(diverged, "MMR never diverged from pure top-k on any query")
  }
}
