package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Similarity, Text}

/** The README's corpus-curation flow (dedup → clusters → filter →
  * split), executed end-to-end on the real testdata — pins the
  * documented composition as runnable truth with row accounting and
  * the invariants a curation run must preserve.
  */
class CurationFlowSpec extends SparkSpec {
  import spark.implicits._

  test("documented curation flow: dedup -> cluster -> filter -> split, with accounting") {
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()

    // near-dup clustering over LSH candidates; drop non-representatives
    val sig = Similarity.minhashSignatures(docs, "doc_id", "text", 64, 5)
    val pairs = Similarity.lshCandidatePairs(sig, "doc_id", 16, 4)
    val cc = Similarity.connectedComponents(pairs)
    val survivors = docs.join(
      cc.where(col("doc_id") =!= col("cluster")), Seq("doc_id"), "left_anti")
    val nSurv = survivors.count()
    cc.unpersist()
    assert(nSurv > 0 && nSurv <= nDocs)
    // every dropped doc belonged to some duplicate cluster
    val nDropped = nDocs - nSurv

    // quality + language gate (scan-local signals)
    val kept = survivors
      .where(round(Text.qualityScore(col("text")), 6) >= 0.5)
      .where(Text.langId(col("text")) =!= "und")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nSurv)

    // deterministic key split: full cover, no overlap, stable
    val split = Relational.groupSplit(kept, "doc_id")
    val bySplit = split.groupBy(col("split")).count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == nKept)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
    // rerunning the split yields the identical assignment (determinism)
    val again = Relational.groupSplit(kept, "doc_id")
      .groupBy(col("split")).count().as[(String, Long)].collect().toMap
    assert(again == bySplit)

    info(s"docs=$nDocs deduped=$nDropped kept=$nKept splits=$bySplit")
  }
}
