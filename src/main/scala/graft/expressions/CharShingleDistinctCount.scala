package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: number of distinct character n-gram
  * shingles of a string (the reference's CharNGramExtractor
  * featurization cardinality, etl_slimpajama_dc_proc.py:41-55).
  *
  * Why a custom Expression (SURVEY §7.3 preference (b)): the
  * composed-builtins form — `array_distinct(transform(sequence(...),
  * i -> substr(...)))` — pays per-position expression-eval machinery
  * and materializes every shingle string into an array; lambda
  * expressions are also excluded from codegen subexpression
  * elimination. This operator does one tight pass per row inside
  * whole-stage codegen (doGenCode emits a static call, the standard
  * pattern for scalar kernels) and allocates only the distinct set.
  * Counting is by Unicode code points, matching substr/DuckDB slicing
  * semantics.
  */
case class CharShingleDistinctCount(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle length must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingle_count expects a string column, got ${child.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_shingle_count"

  override protected def nullSafeEval(input: Any): Any =
    CharShingleOps.distinctCount(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CharShingleOps.distinctCount($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingleOps {

  /** One-pass distinct n-gram count over code points. */
  def distinctCount(s: String, n: Int): Int = {
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < n) return 0
    val seen = new java.util.HashSet[String]()
    // char offsets of each code-point boundary so each shingle is a
    // single O(n) substring, not an O(position) re-scan
    val bounds = new Array[Int](cpCount + 1)
    var ci = 0
    var i = 0
    while (i < cpCount) {
      bounds(i) = ci
      ci = s.offsetByCodePoints(ci, 1)
      i += 1
    }
    bounds(cpCount) = s.length
    var p = 0
    while (p + n <= cpCount) {
      seen.add(s.substring(bounds(p), bounds(p + n)))
      p += 1
    }
    seen.size
  }
}
