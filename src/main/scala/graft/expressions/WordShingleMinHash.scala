package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature of a text column in one per-row pass: word
  * shingles → md5-based 30-bit base hash → numPerms affine minima,
  * with no intermediate shingle strings materialized into the plan
  * (no explode, no aggregation, no shuffle — the signature becomes a
  * scan-time projection).
  *
  * Shares graft.streaming.MinHashLocal's math, which MinHashStreamSpec
  * proves bit-identical to the expression pipeline
  * (ops.Similarity.minhashSignatures) and therefore to the DuckDB
  * oracles. Null when the document has fewer than shingleN words
  * (mirrors the explode path, where such docs produce no signature
  * row).
  *
  * CodegenFallback: the per-row loop (MessageDigest + running minima)
  * is irregular imperative code; it replaces an explode + 64-slot
  * hash aggregate + exchange, so leaving whole-stage codegen for this
  * one projection is the cheaper side of the trade (measured — see
  * SCALING.md).
  */
case class WordShingleMinHash(child: Expression, numPerms: Int, shingleN: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingle_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_minhash expects a string column, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.streaming.MinHashLocal
      .signature(v.asInstanceOf[UTF8String].toString, numPerms, shingleN)
      .map(new GenericArrayData(_)).orNull
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleMinHash =
    copy(child = newChild)
}

/** 60-bit md5 hashes of a text's word shingles in one per-row pass —
  * the inverted-index featurization without ever materializing shingle
  * strings into the plan (an exploded long is ~5× narrower than an
  * exploded shingle string, and the md5 runs over a reused buffer
  * instead of per-shingle UTF8String allocations).
  *
  * distinct=true hashes each distinct STRING once (array length =
  * distinct shingle count, exactly as the SQL formulation computes
  * it); distinct=false emits one hash per occurrence in document
  * order (the repetition-signal featurization). Empty array for docs
  * with fewer than shingleN words (mirrors Similarity.wordShingles).
  */
case class WordShingleHashes(child: Expression, shingleN: Int,
                             distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects a string column, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val text = v.asInstanceOf[UTF8String].toString
      new GenericArrayData(
        if (distinct) graft.streaming.MinHashLocal.shingleHashes(text, shingleN)
        else graft.streaming.MinHashLocal.shingleHashesAll(text, shingleN))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}
