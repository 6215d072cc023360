package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Text}
import graft.pipeline.Judge

/** Round-8 curation operators: SemDeDup, temperature mixture,
  * Fleiss' kappa, token-balanced curriculum shards.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- SemDeDup -----------------------------------------------------

  private def semCorpus = Seq(
    (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
    (2L, Array(0.99, 0.1)), (3L, Array(0.0, 0.9)),
    (4L, Array(-1.0, 0.05))).toDF("vec_id", "embedding")

  private def semCents = Seq(
    (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("cid", "cemb")

  test("semDedup keeps the lowest id per within-cluster near-dup set") {
    val out = Similarity.semDedup(semCorpus, "vec_id", "embedding",
        semCents, minCos = 0.9, maxBlockSize = 100, subPlanes = 4)
      .select(col("vec_id"), col("removed")).as[(Long, Int)]
      .collect().toMap
    assert(out == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("semDedup sub-blocked removals are a subset of exact removals") {
    val exact = Similarity.semDedup(semCorpus, "vec_id", "embedding",
        semCents, 0.9, 100, 4)
      .where(col("removed") === 1).select("vec_id").as[Long].collect().toSet
    val guarded = Similarity.semDedup(semCorpus, "vec_id", "embedding",
        semCents, 0.9, 1, 2)
      .where(col("removed") === 1).select("vec_id").as[Long].collect().toSet
    assert(guarded.subsetOf(exact))
  }

  // --- temperature mixture ------------------------------------------

  private def mixDocs = Seq(
    ("a", "w1 w2 w3 w4 w5 w6 w7 w8"), ("a", "w1 w2 w3 w4 w5 w6 w7 w8"),
    ("b", "w1 w2 w3 w4"), ("c", "w1 w2 w3 w4")).toDF("source", "text")

  test("temperatureReweight at alpha=0 flattens to the uniform mixture") {
    val rows = Text.temperatureReweight(mixDocs, "source", "text", 0.0)
      .select("source", "temp_frac").as[(String, Double)].collect().toMap
    rows.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 2e-6))
  }

  test("temperatureReweight at alpha=1 preserves the natural mixture") {
    val rows = Text.temperatureReweight(mixDocs, "source", "text", 1.0)
      .select("source", "actual_frac", "temp_frac", "weight")
      .as[(String, Double, Double, Double)].collect()
    rows.foreach { case (_, p, q, w) =>
      assert(math.abs(p - q) < 2e-6 && math.abs(w - 1.0) < 1e-4)
    }
  }

  test("temperatureReweight upweights the tail source monotonically in alpha") {
    def weightOf(alpha: Double): Double =
      Text.temperatureReweight(mixDocs, "source", "text", alpha)
        .where(col("source") === "b")
        .select("weight").as[Double].head()
    // smaller alpha → flatter mixture → bigger boost for small sources
    assert(weightOf(0.3) > weightOf(0.7) && weightOf(0.7) > 1.0)
  }

  // --- Fleiss' kappa ------------------------------------------------

  test("fleissReport matches a hand-computed 3-rater example") {
    val ratings = Seq(
      (1L, "A", "A", "A"), (2L, "A", "A", "B"),
      (3L, "B", "B", "B"), (4L, "A", "B", "C"))
      .toDF("doc_id", "label_a", "label_b", "label_c")
    val r = Judge.fleissReport(ratings, "doc_id",
      Seq("label_a", "label_b", "label_c")).collect().head
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Int]("n_raters") == 3)
    // pbar = 14/24, pe = 62/144, kappa = 22/82
    assert(r.getAs[Double]("pbar") == 0.583333)
    assert(r.getAs[Double]("pe") == 0.430556)
    assert(r.getAs[Double]("kappa") == 0.268293)
  }

  test("fleissReport: perfect agreement gives kappa 1, constant raters NULL") {
    val perfect = Seq((1L, "A", "A", "A"), (2L, "B", "B", "B"))
      .toDF("doc_id", "label_a", "label_b", "label_c")
    val p = Judge.fleissReport(perfect, "doc_id",
      Seq("label_a", "label_b", "label_c")).collect().head
    assert(p.getAs[Double]("kappa") == 1.0)
    val const = Seq((1L, "A", "A", "A"), (2L, "A", "A", "A"))
      .toDF("doc_id", "label_a", "label_b", "label_c")
    val c = Judge.fleissReport(const, "doc_id",
      Seq("label_a", "label_b", "label_c")).collect().head
    assert(c.isNullAt(c.fieldIndex("kappa")))
  }

  // --- source overlap matrix ----------------------------------------

  test("sourceOverlapMatrix computes exact Jaccard without sampling") {
    val docs = Seq(
      ("A", "w1 w2 w3 w4"), // grams: w1w2w3, w2w3w4
      ("B", "w1 w2 w3 x"),  // grams: w1w2w3, w2w3x → shared 1 of 3
      ("C", "a b c d e")).toDF("source", "text")
    val rows = Text.sourceOverlapMatrix(docs, "source", "text", 3, 1L)
      .as[(String, String, Long, Double)].collect()
    assert(rows.toSeq == Seq(("A", "B", 1L, 0.333333)),
      s"unexpected matrix: ${rows.toSeq}") // C overlaps nothing → absent
  }

  // --- kNN label agreement ------------------------------------------

  test("knnLabelAgreement flags the mislabeled point in a clean geometry") {
    val e = Seq(
      (0L, 0, Array(1.0, 0.0)), (1L, 0, Array(0.99, 0.01)),
      (2L, 0, Array(0.98, 0.02)),
      (3L, 1, Array(0.0, 1.0)), (4L, 1, Array(0.01, 0.99)),
      (5L, 0, Array(0.02, 0.98))) // geometrically in cluster 1, labeled 0
      .toDF("vec_id", "label", "embedding")
    val per = Similarity.knnLabelAgreement(e, "vec_id", "label",
        "embedding", lit(true), k = 2)
      .select(col("query_id"), col("n_same")).as[(Long, Long)]
      .collect().toMap
    assert(per(0L) == 2L && per(1L) == 2L && per(2L) == 2L)
    assert(per(5L) == 0L, s"mislabeled point not isolated: $per")
    // its presence also dents the true cluster-1 members' agreement
    assert(per(3L) == 1L && per(4L) == 1L)
  }

  // --- BPE merge induction ------------------------------------------

  test("bpeMergeRounds replays hand-computed merges and stops when dry") {
    val docs = Seq("ab ab ab cd").toDF("text")
    val rows = Text.bpeMergeRounds(docs, "text", rounds = 3, topWords = 100)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    // round 1: (a,b) x3 wins; inventory {ab, c, d}
    // round 2: only (c,d) x1 remains; inventory {ab, cd}
    // round 3: no adjacent pairs left -> loop exhausts at 2 rows
    assert(rows == Seq((1, "a", "b", 3L, 3L), (2, "c", "d", 1L, 2L)))
  }

  test("bpeMergeRounds merges adjacent repeats leftmost-first") {
    // "aaa": pairs (a,a) x2; after merging |a||a| leftmost-first the
    // word is |aa||a| — NOT |a||aa| — so round 2 must see (aa, a)
    val docs = Seq("aaa aaa").toDF("text")
    val rows = Text.bpeMergeRounds(docs, "text", rounds = 2, topWords = 10)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(rows == Seq((1, "a", "a", 4L, 2L), (2, "aa", "a", 2L, 1L)))
  }

  // --- curriculum shards --------------------------------------------

  test("curriculumShards balances token mass and orders difficulty") {
    val d = Tables.load(spark, sfDir, "documents")
    val shards = Text.curriculumShards(d, "doc_id", "text", "n_chars", 8)
      .collect()
    assert(shards.length == 8)
    val total = d.select(sum(size(split(col("text"), " ")).cast("long")))
      .as[Long].head()
    val maxDoc = d.select(max(size(split(col("text"), " ")).cast("long")))
      .as[Long].head()
    val target = total.toDouble / 8
    shards.foreach { r =>
      assert(math.abs(r.getAs[Long]("n_tokens") - target) <= maxDoc,
        s"shard ${r.getAs[Long]("shard")} off balance")
    }
    assert(shards.map(_.getAs[Long]("n_tokens")).sum == total)
    // difficulty ranges are monotone: a shard never starts below the
    // previous shard's end (equal at a bucket straddling the cut)
    val sorted = shards.sortBy(_.getAs[Long]("shard"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_cpt") <= b.getAs[Long]("min_cpt"))
      case _ =>
    }
  }

  // --- duplicatedSpans (ExactSubstr-style) --------------------------

  private def spanCorpus = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x y a b c d e q"),
    (3L, "p q r p q r p q r"),
    (4L, "a b c z z z c d e"),
    (5L, "a b"), // shorter than k — no windows
    (6L, "m n o p"),
    (7L, "m n o p")).toDF("doc_id", "text")

  private def spansOf(df: org.apache.spark.sql.DataFrame) =
    Text.duplicatedSpans(df, "doc_id", "text", 3)
      .as[(Long, Int, Int)].collect().toSet

  test("duplicatedSpans merges overlapping shared windows into maximal spans") {
    val spans = spansOf(spanCorpus)
    // doc1/doc2 share the 5-token run "a b c d e"; doc4 shares two
    // disjoint 3-token runs with doc1 (island separation); doc7=doc6
    // whole-doc duplicate covers the full doc.
    assert(spans == Set(
      (1L, 0, 4), (2L, 2, 6),
      (4L, 0, 2), (4L, 6, 8),
      (6L, 0, 3), (7L, 0, 3)))
  }

  test("duplicatedSpans ignores within-document-only repeats") {
    val spans = spansOf(spanCorpus)
    assert(!spans.exists(_._1 == 3L), "doc3 repeats only within itself")
    assert(!spans.exists(_._1 == 5L), "doc5 is shorter than k")
  }

  test("duplicatedSpansToCut keeps the lowest-id occurrence and cuts the rest") {
    val spans = Text.duplicatedSpansToCut(spanCorpus, "doc_id", "text", 3)
      .as[(Long, Int, Int)].collect().toSet
    // doc1 is the lowest-id holder of "a b c d e" → keeps it; doc2
    // cuts its copy; doc4's two runs are also doc1-owned → cut; doc6
    // keeps, doc7 cuts
    assert(spans == Set((2L, 2, 6), (4L, 0, 2), (4L, 6, 8), (7L, 0, 3)),
      s"got $spans")
    // cut spans are a subset of the all-occurrences spans
    val all = spansOf(spanCorpus)
    assert(spans.subsetOf(all))
  }

  test("duplicatedSpans recovers a long run exactly (window cover, no over-extension)") {
    val df = Seq(
      (1L, "u v w a a a a a a a x y z"),
      (2L, "k a a a a a a a m")).toDF("doc_id", "text")
    // the shared run is the 7 'a's: doc1 positions 3..9, doc2 1..7
    assert(spansOf(df) == Set((1L, 3, 9), (2L, 1, 7)))
  }
}
