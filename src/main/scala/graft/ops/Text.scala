package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-analysis operators for large-scale corpus pipelines: language
  * identification, quality scoring, token counting, fingerprinting.
  * The reference's corpus-ETL flow (apps/etl/etl_slimpajama_dc_proc.py)
  * filters on word counts and near-duplicate structure; these operators
  * extend that family with the standard pretraining-data signals.
  *
  * Everything is a pure Catalyst expression (codegen'd, no UDFs): at
  * 100 TB the per-row cost dominates, and expression trees keep the
  * whole scan→filter→project pipeline in one WholeStageCodegen span
  * with column pruning reaching the parquet reader.
  */
object Text {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deliberately small and deterministic —
    * the point is the operator shape (vectorizable membership counting
    * + argmax), not linguistic coverage; swap in real profiles at
    * deployment.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "ein"))

  private def words(text: Column): Column = split(lower(text), " ")

  /** Stopword hits for one profile over a lowercased word array. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(text), w => w.isin(stopwords: _*)))

  /** Language-ID: argmax of per-profile stopword hit counts; ties go to
    * profile order (en > es > de); zero hits everywhere → "und".
    * A deterministic scalar expression, so Catalyst can push the
    * computation next to the scan and the oracle can reproduce it.
    */
  def langId(text: Column): Column = {
    // Argmax by struct ordering (hits, rank, lang): each profile's hit
    // count is evaluated exactly once. A when-chain referencing the
    // counts multiple times inlines the filter lambda ~8×, which blew
    // generated-code size to a 16 s Janino compile per task — at 1000
    // executors that's recompiled everywhere, so expression-tree size
    // is a real scale concern, not cosmetics.
    // "und" rides along as a rank-4 zero-hit entry: it wins ties only
    // when every profile scored 0 (positive hits always beat it).
    val entries = LangProfiles.zipWithIndex.map { case ((lang, sw), i) =>
      struct(
        stopwordHits(text, sw).as("hits"),
        lit(LangProfiles.size - i).as("rank"),
        lit(lang).as("lang"))
    } :+ struct(lit(0).as("hits"), lit(LangProfiles.size + 1).as("rank"),
        lit("und").as("lang"))
    array_max(array(entries: _*)).getField("lang")
  }

  /** Punctuation characters counted by the quality score. Explicit
    * class (not \p{Punct}) so Java regex and RE2 agree exactly.
    */
  val PunctClass = "[.,!?;:'\"()\\-]"

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctClass, ""))

  /** Document quality score in [0,1] from cheap surface signals —
    * length band, punctuation ratio, stopword ratio, mean word length
    * (the standard pretraining-corpus heuristics, cf. Gopher/C4 rules).
    * All arithmetic in doubles with a fixed evaluation order; callers
    * should round before hash-comparison.
    */
  def qualityScore(text: Column): Column = {
    val nw = wordCount(text).cast("double")
    val len = length(text).cast("double")
    val meanWordLen = (len - (nw - 1)) / nw // chars excluding separators
    val punctRatio = punctCount(text).cast("double") / len
    val stopRatio =
      stopwordHits(text, LangProfiles.flatMap(_._2)).cast("double") / nw
    val lengthOk = when(nw >= 20 && nw <= 100000, 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio <= 0.2, 1.0).otherwise(0.0)
    val stopSig = least(stopRatio * lit(5.0), lit(1.0))
    (lengthOk * 0.3 + wordLenOk * 0.2 + punctOk * 0.2 + stopSig * 0.3)
  }

  /** Pretraining-corpus text cleanup: drop URLs and e-mail addresses,
    * strip non-printable control characters, collapse whitespace runs,
    * trim. Patterns deliberately stay in the regex subset Java and
    * RE2 interpret identically so the oracle can mirror them.
    */
  val UrlPattern = """https?://[^ ]+"""
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ControlPattern = """[\x00-\x08\x0b\x0c\x0e-\x1f]"""

  def cleanText(text: Column): Column = {
    val noUrl = regexp_replace(text, UrlPattern, " ")
    val noMail = regexp_replace(noUrl, EmailPattern, " ")
    val noCtl = regexp_replace(noMail, ControlPattern, " ")
    trim(regexp_replace(noCtl, """\s+""", " "))
  }

  /** Context-window chunking: split a document into word chunks of
    * `chunkWords` with `strideWords` between chunk starts (stride <
    * chunk gives overlap). The standard pretraining prep for packing
    * long documents into bounded sequences, as a pure scan-time
    * expression — chunk assignment never shuffles. The tail chunk may
    * be shorter; docs shorter than one chunk yield themselves.
    */
  def wordChunks(text: Column, chunkWords: Int, strideWords: Int): Column = {
    val w = split(text, " ")
    // chunk starts at 0, stride, 2·stride, …, stopping at the FIRST
    // window that reaches the document end: lastStart =
    // ceil(max(nw - chunk, 0) / stride). Running starts all the way to
    // nw would emit tail chunks that are strict suffixes of the
    // previous chunk — measured 12.9 % duplicated chunks at sf0.1
    // (caught in review); a training-sequence packer must not see the
    // same tail twice. Non-negative double division cast to int
    // truncates = floor.
    val lastStart = ((greatest(size(w) - chunkWords, lit(0))
      + lit(strideWords - 1)) / lit(strideWords)).cast("int")
    transform(
      sequence(lit(0), lastStart),
      i => concat_ws(" ", slice(w, i * strideWords + lit(1), lit(chunkWords))))
  }

  /** Rolling polynomial fingerprint over words, mod 2^31-1 — a
    * content-defined document identity that is stable under
    * re-partitioning (left fold in array order) and cheap to compare.
    * h_i = (h_{i-1} * 31 + md5Long(word) mod M) mod M.
    */
  def rollingFingerprint(text: Column): Column = {
    val M = 2147483647L
    aggregate(
      words(text),
      lit(0L),
      (h, w) => pmod(h * lit(31L) + pmod(hash60(w), lit(M)), lit(M)))
  }
}
