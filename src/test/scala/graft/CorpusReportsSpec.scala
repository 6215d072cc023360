package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Specs for the round-8 corpus-report operators: per-source Gini
  * concentration, n-gram diversity, Zipf fit, RRF hybrid retrieval,
  * LSH canonical attribution / per-source dedup impact, and
  * leakage-safe CV folds.
  */
class CorpusReportsSpec extends SparkSpec {
  import spark.implicits._

  /** Writes (doc_id, text, lang, source, n_chars) rows as a temp
    * documents.parquet dir consumable by Tables.load.
    */
  private def tmpCorpus(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("lshCanonicalIds agrees with lshDroppedIds and maps survivors to themselves") {
    val d = Tables.load(spark, sfDir, "documents")
    val sig = Similarity.minhashSignatures(d, "doc_id", "text", 64, 5)
    val canon = Similarity.lshCanonicalIds(sig, "doc_id", 16, 4)
      .as[(Long, Long)].collect().toMap
    val dropped = Similarity.lshDroppedIds(sig, "doc_id", 16, 4)
      .as[Long].collect().toSet
    assert(canon.nonEmpty)
    canon.foreach { case (id, c) =>
      assert(c <= id, s"canonical $c above doc $id")
      assert((c < id) == dropped.contains(id),
        s"doc $id: canon=$c vs dropped=${dropped.contains(id)}")
    }
  }

  test("source_gini_tokens is exact on a hand-computed corpus") {
    // source a: four equal-length docs -> gini 0
    // source b: lengths 1 and 3 -> G = ((2*1-3)*1 + (2*2-3)*3) / (2*4) = 0.25
    val dir = tmpCorpus(Seq(
      (0L, "x y z", "a"), (1L, "p q r", "a"),
      (2L, "u v w", "a"), (3L, "m n o", "a"),
      (4L, "solo", "b"), (5L, "one two three", "b")))
    val out = SparkEntry.queries("source_gini_tokens")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 4L, 12L, 0.0), ("b", 2L, 4L, 0.25)))
  }

  test("ngram_diversity_report is exact on a hand-computed corpus") {
    val dir = tmpCorpus(Seq((0L, "a b a b", "s")))
    val out = SparkEntry.queries("ngram_diversity_report")(spark, dir)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1, 4L, 2L, 0.5),      // a b a b
      (2, 3L, 2L, 0.666667), // "a b" "b a" "a b"
      (3, 2L, 2L, 1.0)))     // "a b a" "b a b"
  }

  test("vocab_zipf_fit recovers slope ~ -1 on an exact power-law vocabulary") {
    // token w_i appears floor(2000 / i) times: ln(freq) ~ ln(2000) - ln(rank)
    val words = (1 to 60).flatMap(i => Seq.fill(2000 / i)(f"w$i%03d"))
    val dir = tmpCorpus(words.grouped(200).zipWithIndex.map {
      case (g, i) => (i.toLong, g.mkString(" "), "s")
    }.toSeq)
    val r = SparkEntry.queries("vocab_zipf_fit")(spark, dir).collect().head
    val (n, slope, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(3))
    assert(n == 60L)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope")
    assert(r2 > 0.999, s"r2 $r2")
  }

  test("retrieval_rrf_hybrid scores decompose into the two rank legs") {
    val out = SparkEntry.queries("retrieval_rrf_hybrid")(spark, sfDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val vec = Option(r.get(2)).map(_.asInstanceOf[Int])
      assert(lex.isDefined || vec.isDefined)
      val expect = lex.map(l => 1.0 / (60 + l)).getOrElse(0.0) +
        vec.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6)
    }
    // descending by fused score
    val rrfs = out.map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("dedup_impact_by_source accounting ties out against lshDroppedIds") {
    val d = Tables.load(spark, sfDir, "documents")
    val sig = Similarity.minhashSignatures(d, "doc_id", "text", 64, 5)
    val nDropped = Similarity.lshDroppedIds(sig, "doc_id", 16, 4).count()
    val rows = SparkEntry.queries("dedup_impact_by_source")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == d.count())
    assert(rows.map(_.getLong(2)).sum == nDropped)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "cross-source exceeds removed")
      val rate = r.getDouble(5)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("cv folds never split an LSH candidate pair (leakage property)") {
    val d = Tables.load(spark, sfDir, "documents")
    val sig = Similarity.minhashSignatures(d, "doc_id", "text", 64, 5)
    val pairs = Similarity.lshCandidatePairs(sig, "doc_id", 16, 4, 1000)
    val cc = Similarity.connectedComponents(pairs)
    import graft.functions.GraftFunctions.detHash
    val fold = d.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), detHash(5L, col("cluster")).as("fold"))
    val crossFold = pairs
      .join(fold.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("fold", "fa"), Seq("id_a"))
      .join(fold.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("fold", "fb"), Seq("id_b"))
      .where(col("fa") =!= col("fb")).count()
    assert(pairs.count() > 0, "no candidate pairs — property vacuous")
    assert(crossFold == 0, s"$crossFold near-dup pairs split across folds")
    // census covers the corpus exactly once
    val census = SparkEntry.queries("cv_folds_leakage_safe")(spark, sfDir).collect()
    assert(census.map(_.getLong(1)).sum == d.count())
    assert(math.abs(census.map(_.getDouble(4)).sum - 1.0) < 0.001)
  }

  test("semDedupCentroidRank keeps the member closest to the centroid, not the lowest id") {
    // centroid c0 = (1, 0). Three near-dup vectors in its cell; the
    // HIGHEST id is the closest to the centroid, so the id-ranked
    // rule and the centroid-ranked rule disagree on purpose.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid seed
      (10L, Array(0.90f, 0.44f)), // cos to c0 ~ .898
      (11L, Array(0.92f, 0.40f)), // cos to c0 ~ .917
      (12L, Array(0.95f, 0.32f))  // cos to c0 ~ .948  <- best rank
    ).toDF("vec_id", "embedding")
    val cents = emb.where(col("vec_id") === 0L)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val out = Similarity.semDedupCentroidRank(emb, "vec_id", "embedding",
        cents, minCos = 0.99, maxBlockSize = 50, subPlanes = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(12L) == 0, "best-ranked member must survive")
    assert(out(10L) == 1 && out(11L) == 1, "dominated members removed")
    // the id-ranked variant keeps 10 instead — the rules must differ here
    val byId = Similarity.semDedup(emb, "vec_id", "embedding",
        cents, minCos = 0.99, maxBlockSize = 50, subPlanes = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(byId(10L) == 0 && byId(12L) == 1)
  }

  test("embedding_norm_report is exact on known vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    Seq((0L, Array(3.0f, 4.0f), 0), (1L, Array(6.0f, 8.0f), 0),
        (2L, Array(0.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("embedding_norm_report")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // label 0: norms 5 and 10 -> mean 7.5, std 2.5; label 1: norm 2
    assert(rows.toSeq == Seq((0, 2L, 7.5, 5.0, 10.0, 2.5),
      (1, 1L, 2.0, 2.0, 2.0, 0.0)))
  }

  test("bpe_encode_stats tokenizes a hand-computed corpus exactly") {
    // vocab: abc x5, ab x3, bc x2. Merges: (a,b) count 8, then
    // (ab,c) count 5, then (b,c) count 2 — after 3 rounds every
    // corpus word encodes to ONE token: 25 chars / 10 tokens = 2.5.
    val dir = tmpCorpus(Seq(
      (0L, "abc abc abc abc abc", "s"),
      (1L, "ab ab ab", "s"),
      (2L, "bc bc", "s")))
    val rows = SparkEntry.queries("bpe_encode_stats")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(("s", 10L, 25L, 10L, 2.5)))
  }

  test("retrieval_rbo_overlap matches a plain-Scala RBO over the same pools") {
    val (lexDf, denDf) = TextQueries.retrievalPools(spark, sfDir)
    val lex = lexDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val den = denDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ms = lex.keySet.intersect(den.keySet).toSeq
      .map(id => math.max(lex(id), den(id)))
    val expectRbo = ms.flatMap(m => (m to 50).map(d =>
      BigDecimal(0.1 * math.pow(0.9, d - 1) / d)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))).sum
    val r = SparkEntry.queries("retrieval_rbo_overlap")(spark, sfDir)
      .collect().head
    assert(r.getLong(0) == ms.size)
    assert(r.getLong(1) == ms.count(_ <= 10))
    assert(math.abs(r.getDouble(2) -
      expectRbo.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("embedding_centroid_drift is exact on hand-placed centroids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // label 0: both halves centered at (1,0) -> cos 1, ratio 1
    // label 1: half A at (0,1), half B at (0,2) -> cos 1, ratio 2
    // label 2: half A at (1,0), half B at (0,1) -> cos 0, ratio 1
    Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
        (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.0f, 2.0f), 1),
        (4L, Array(1.0f, 0.0f), 2), (5L, Array(0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("embedding_centroid_drift")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((0, 1L, 1L, 1.0, 1.0),
      (1, 1L, 1L, 1.0, 2.0), (2, 1L, 1L, 0.0, 1.0)))
  }

  test("mix_quality_matrix rows are a consistent allocation (fractions tie out)") {
    val rows = SparkEntry.queries("mix_quality_matrix")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    // per-source: src_frac sums to 1, temp_frac is constant,
    // alloc_frac ~= temp_frac * src_frac per cell
    rows.groupBy(_._1).foreach { case (src, cells) =>
      assert(math.abs(cells.map(_._5).sum - 1.0) < 1e-4, s"src_frac sum $src")
      assert(cells.map(_._6).distinct.length == 1, s"temp_frac varies in $src")
      cells.foreach(c =>
        assert(math.abs(c._7 - c._6 * c._5) < 1e-6, s"alloc cell $c"))
    }
    // whole-mixture: alloc fractions sum to ~1 across all cells
    assert(math.abs(rows.map(_._7).sum - 1.0) < 1e-3)
    // token accounting ties to the corpus
    val totalWords = Tables.load(spark, sfDir, "documents")
      .select(graft.functions.GraftFunctions.wordCount(col("text")).cast("long"))
      .as[Long].collect().sum
    assert(rows.map(_._4).sum == totalWords)
  }

  test("shard_skew_forecast ties out against a direct per-shard aggregate") {
    import graft.functions.GraftFunctions.{detHash, wordCount}
    val per = Tables.load(spark, sfDir, "documents")
      .select(detHash(32L, col("doc_id")).as("shard"),
        wordCount(col("text")).cast("long").as("nw"))
      .groupBy("shard").agg(sum(col("nw")).as("t"))
      .select(col("t")).as[Long].collect()
    val r = SparkEntry.queries("shard_skew_forecast")(spark, sfDir)
      .collect().head
    assert(r.getLong(0) == per.length)
    assert(r.getLong(1) == per.min && r.getLong(2) == per.max)
    assert(r.getDouble(4) >= 1.0, "max/mean below 1 is impossible")
    val mean = per.sum.toDouble / per.length
    assert(math.abs(r.getDouble(4) - per.max / mean) < 1e-6)
  }

  test("orders_pareto_deciles: deciles partition customers, shares telescope to 1") {
    val rows = SparkEntry.queries("orders_pareto_deciles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val nCust = Tables.load(spark, sfDir, "orders")
      .select(countDistinct(col("o_custkey"))).as[Long].head()
    assert(rows.map(_._2).sum == nCust)
    // top decile carries the largest share; shares are non-increasing
    rows.sliding(2).foreach {
      case Array(hi, lo) => assert(hi._3 >= lo._3, s"shares not sorted: $hi $lo")
      case _ =>
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-6, "cumulative share must end at 1")
  }

  test("temporal_split_events: splits partition the events, overlap bounded") {
    val rows = SparkEntry.queries("temporal_split_events")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("test", "train"))
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_._2).sum == total)
    val Seq(test, train) = rows.map(_._2).toSeq
    assert(train > test, "cutoff at 4/5 of the range should favor train")
    rows.foreach { r =>
      assert(r._4 <= r._3, "overlap cannot exceed a split's users")
      assert(r._5 >= 0.0 && r._5 <= 1.0)
    }
  }

  test("vocab_heaps_fit: sublinear growth exponent with a tight log-log fit") {
    val r = SparkEntry.queries("vocab_heaps_fit")(spark, sfDir).collect().head
    assert(r.getLong(0) == 10L)
    val beta = r.getDouble(1)
    assert(beta > 0.0 && beta < 1.0, s"Heaps beta out of range: $beta")
    assert(r.getDouble(3) > 0.9, "log-log fit should be tight on this corpus")
  }

  test("text_langid_confusion: row fractions sum to 1 per true language") {
    val rows = SparkEntry.queries("text_langid_confusion")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._3).sum - 1.0) < 1e-4, s"fracs for $lang")
    }
    val total = rows.map(_._2).sum
    assert(total == Tables.load(spark, sfDir, "documents").count())
  }

  test("embedding_truncation_recall: full width anchors at 1.0, all recalls in range") {
    val rows = SparkEntry.queries("embedding_truncation_recall")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L))
    assert(rows.last._2 == 1.0, "full-dim recall must be exactly 1")
    assert(rows.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
  }

  test("curation_funnel: stages are monotone non-increasing and anchored at the corpus") {
    val rows = SparkEntry.queries("curation_funnel")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (0L to 5L))
    val (nDocs, nTokens) = {
      val d = Tables.load(spark, sfDir, "documents")
        .select(graft.functions.GraftFunctions.wordCount(col("text")).cast("long"))
        .as[Long].collect()
      (d.length.toLong, d.sum)
    }
    assert(rows.head._3 == nDocs && rows.head._4 == nTokens)
    assert(rows.head._5 == 1.0)
    rows.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(lo._3 <= hi._3 && lo._4 <= hi._4 && lo._5 <= hi._5,
          s"funnel not monotone: $hi -> $lo")
      case _ =>
    }
  }

  test("quantile_sample_error: sample estimates bracket the exact values sanely") {
    val rows = SparkEntry.queries("quantile_sample_error")(spark, sfDir).collect()
    assert(rows.length == 3)
    val e = Tables.load(spark, sfDir, "events")
    val (nFull, exact) = graft.ops.Quantile.exactQuantiles(e, "value",
      Seq(0.5, 0.9, 0.99))
    rows.zip(exact).foreach { case (r, ex) =>
      assert(r.getLong(1) == nFull)
      assert(r.getLong(2) < nFull, "sample must be a strict subset")
      assert(r.getDouble(3) == ex, "exact column must match exactQuantiles")
      assert(r.getDouble(5) >= 0.0)
      assert(math.abs(r.getDouble(4) - r.getDouble(3)) <=
        r.getDouble(5) + 1e-6, "abs_error consistent with its operands")
    }
  }

  test("shard_rendezvous_moves: moved docs all land on the new shard, " +
    "movement ~1/(N+1), mod-hash reshuffles most of the corpus") {
    val rows = SparkEntry.queries("shard_rendezvous_moves")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 7L))
    // HRW invariant: a doc moves only when the NEW shard outbids its
    // old owner — nothing may move between pre-existing shards
    assert(rows.forall(_.getLong(3) == 0L), "n_moved_elsewhere must be 0")
    val nDocs = rows.map(_.getLong(1)).sum
    val nMoved = rows.map(_.getLong(2)).sum
    val nModMoved = rows.map(_.getLong(4)).sum
    val movedFrac = nMoved.toDouble / nDocs
    // expectation 1/9 ≈ 0.111; loose bounds for a small corpus
    assert(movedFrac > 0.03 && movedFrac < 0.25, s"moved $movedFrac")
    // mod-hash expectation 8/9 ≈ 0.889 — an order of magnitude worse
    assert(nModMoved.toDouble / nDocs > 0.6)
    assert(nModMoved > 4 * nMoved)
  }

  test("shard_rendezvous_weighted: upgrade moves docs only onto the " +
    "upgraded shard, at the share-growth rate") {
    val rows = SparkEntry.queries("shard_rendezvous_weighted")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L to 7L))
    assert(rows.forall(_._4 == 0L), "movement between unchanged shards")
    // the upgraded shard's own docs never move (its score only grew)
    assert(rows.find(_._1 == 3L).get._3 == 0L)
    val nDocs = rows.map(_._2).sum
    val nMoved = rows.map(_._3).sum
    val frac = nMoved.toDouble / nDocs
    // expected share growth 3/10 − 1/8 = 0.175; loose small-corpus band
    assert(frac > 0.08 && frac < 0.30, s"moved $frac")
  }

  test("shard_rendezvous_drain: survivors lose nothing, the drained " +
    "shard loses everything, recipients split by weight") {
    val rows = SparkEntry.queries("shard_rendezvous_drain")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (0L to 7L))
    val drained = rows.find(_._1 == 5L).get
    // the drained shard empties, receives nothing, loses all its docs
    assert(drained._3 == 0L && drained._4 == 0L && drained._2 == drained._5,
      s"drained row: $drained")
    // NO surviving shard loses a doc — removing a non-winning
    // candidate cannot change anyone else's argmax
    assert(rows.filter(_._1 != 5L).forall(_._5 == 0L),
      s"survivor churn: ${rows.toSeq}")
    // every drained doc lands somewhere among the survivors
    assert(rows.map(_._4).sum == drained._2)
    // the weight-3 shard receives the largest share of the drain
    val recv = rows.filter(_._1 != 5L).map(r => r._1 -> r._4).toMap
    assert(recv(3L) == recv.values.max,
      s"weight-3 shard should absorb the most: $recv")
  }

  test("shard_rendezvous_rebalance: fractional weight change moves docs " +
    "only off the downgraded shard or onto the upgraded one") {
    val rows = SparkEntry.queries("shard_rendezvous_rebalance")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == (0L to 7L))
    // rendezvous locality: no move is both from an unchanged shard
    // and to a non-upgraded shard
    assert(rows.forall(_._5 == 0L), s"invalid moves: ${rows.toSeq}")
    // the upgraded shard never loses a doc (its score only rose)
    assert(rows.find(_._1 == 6L).get._3 == 0L)
    // unchanged shards move docs ONLY onto the upgraded shard
    rows.filter(r => r._1 != 3L && r._1 != 6L).foreach { r =>
      assert(r._3 == r._4, s"unchanged shard ${r._1} moved off-target: $r")
    }
    // the downgraded shard scatters: its moved docs exceed its
    // to-upgraded slice (it redistributes per-weight to everyone)
    val down = rows.find(_._1 == 3L).get
    assert(down._3 > down._4, s"downgraded row: $down")
    // aggregate movement is the share delta, not a reshuffle:
    // shard 3 loses 3/10−2/9.5 ≈ 8.9 %, shard 6 gains ≈ 5.8 % of the
    // corpus → total ≲ 15 %; loose small-corpus band
    val frac = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(frac > 0.03 && frac < 0.30, s"moved $frac")
  }

  test("shard_rendezvous_reweight_multi: simultaneous re-weighting obeys " +
    "the generalized locality law and the max-ratio shard never loses") {
    val rows = SparkEntry.queries("shard_rendezvous_reweight_multi")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq == (0L to 7L))
    // a move must leave a downgraded shard or land on an upgraded one
    assert(rows.forall(_._6 == 0L), s"invalid moves: ${rows.toSeq}")
    // the max-ratio shard (6: 1 → 1.5) cannot be overtaken anywhere
    assert(rows.find(_._1 == 6L).get._3 == 0L)
    // unchanged shards move docs only onto the two upgraded shards
    rows.filter(r => !Set(1L, 3L, 4L, 6L).contains(r._1)).foreach { r =>
      assert(r._3 == r._4 + r._5, s"unchanged shard ${r._1} off-target: $r")
    }
    // both downgraded shards actually shed load
    assert(rows.find(_._1 == 3L).get._3 > 0L)
    assert(rows.find(_._1 == 4L).get._3 > 0L)
    // movement stays a minority of the corpus (rendezvous, not mod-hash)
    val frac = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(frac > 0.03 && frac < 0.35, s"moved $frac")
  }
}
