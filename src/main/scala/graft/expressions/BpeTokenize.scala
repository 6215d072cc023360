package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer over a learned merges table — the real
  * counterpart of the BPE-ish regex stand-in (reference cost estimation
  * loads an HF tokenizer, apps/cost_estimator_inf.py:35-50; this loads
  * the public merges.txt format those tokenizers ship: one "left right"
  * pair per line, rank = line order).
  *
  * Algorithm (standard BPE encode): pre-tokenize with the same
  * letter-run/digit-run/symbol pattern as GraftFunctions.bpeTokens,
  * split each pre-token into characters, then repeatedly merge the
  * adjacent pair with the lowest rank until no adjacent pair is in the
  * table. Serializable — ships inside expressions to executors; the
  * ranks map is built once per deserialized instance.
  */
final case class BpeVocab(merges: IndexedSeq[(String, String)]) extends Serializable {

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private val PreToken = java.util.regex.Pattern.compile(
    graft.functions.GraftFunctions.BpeTokenPattern)

  def encodePreToken(s: String): Seq[String] = {
    // split by code point, not UTF-16 char: a supplementary-plane
    // character (emoji etc.) must stay one symbol, or no merges entry
    // could ever match it and outputs would carry lone surrogates
    var symbols: IndexedSeq[String] = s.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toIndexedSeq
    var done = symbols.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        symbols = (symbols.take(bestIdx) :+
          (symbols(bestIdx) + symbols(bestIdx + 1))) ++ symbols.drop(bestIdx + 2)
        done = symbols.length < 2
      }
    }
    symbols
  }

  def tokenize(text: String): Seq[String] = {
    val m = PreToken.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out ++= encodePreToken(m.group())
    out.result()
  }

  def countTokens(text: String): Int = tokenize(text).size
}

object BpeVocab {

  /** Parse merges.txt content: one "left right" pair per line, rank =
    * line order; blank lines and the optional "#version" header are
    * skipped (the format HF/GPT-2 tokenizers publish). Only the
    * literal "#version" header is dropped — merge rules whose left
    * symbol is '#' (markdown/code vocabularies have them) are real.
    */
  def fromMerges(lines: Iterator[String]): BpeVocab =
    BpeVocab(lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#version"))
      .map { l =>
        val sp = l.split(" ", 2)
        // the published format has no comments besides the #version
        // header, so a spaceless line is corruption — fail loudly
        // rather than silently dropping a rank slot
        require(sp.length == 2,
          s"merges line is not a 'left right' pair: '$l' " +
            "(only the #version header may be non-rule content)")
        (sp(0), sp(1))
      }.toIndexedSeq)

  def load(path: String): BpeVocab = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromMerges(src.getLines()) finally src.close()
  }
}

/** Column expression: BPE token count of a string under `vocab`.
  * CodegenFallback is deliberate — applying a learned merges table is
  * irregular per-row logic with no SQL equivalent, and the reference
  * pays a far larger per-row cost calling a Python tokenizer. The
  * regex-count expression remains the codegen'd, oracle-mirrored
  * estimate; this is the exact count for deployments that ship their
  * model's merges file.
  */
case class BpeTokenCount(child: Expression, vocab: BpeVocab)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    vocab.countTokens(input.asInstanceOf[UTF8String].toString)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
