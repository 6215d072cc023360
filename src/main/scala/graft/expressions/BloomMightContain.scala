package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Scan-time membership probe against a pre-built bloom filter
  * (`Dataset.stat.bloomFilter` — distributed treeAggregate build).
  * No false negatives: `false` proves the key was never inserted, so
  * an anti join can skip those rows before any shuffle; `true` rows
  * still need the exact check (see ops.Bloom.antiJoinBloom).
  *
  * The filter ships to executors once per plan (Catalyst reference
  * object, not per-row), and the probe stays inside whole-stage
  * codegen — string keys probe the UTF8 bytes directly, matching
  * BloomFilter.putString's encoding, with no String allocation.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, long, or binary, got $t")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case LongType   => filter.mightContainLong(input.asInstanceOf[Long])
    case BinaryType => filter.mightContainBinary(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
