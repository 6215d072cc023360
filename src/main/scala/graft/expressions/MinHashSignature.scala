package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst aggregate: the full MinHash signature in one pass
  * (SURVEY §7.3's anticipated TypedImperativeAggregate). Input: the
  * 30-bit base hash of each shingle. Buffer: numPerms running minima
  * of the affine hash family h_i(x) = ((2i+1)x + 7919i + 12345) mod
  * (2^31-1) — the same family as ops.Similarity.minhashPerm, so
  * results are bit-identical to the 64-column min() formulation and
  * its SQL oracle.
  *
  * Measured tradeoff (sf0.1, local[32]): the 64-column min()
  * formulation wins (~10s vs ~17s warm) because it stays inside
  * whole-stage codegen HashAggregate, while a TypedImperativeAggregate
  * forces ObjectHashAggregate with per-row child.eval. This aggregate
  * is retained for regimes where per-column agg slots stop scaling —
  * very high numPerms (256+) or memory-constrained buffers — and as
  * the engine's TypedImperativeAggregate extension-point reference.
  * ops.Similarity.minhashSignatures uses the min-column formulation.
  */
case class MinHashSignature(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L // 2^31 - 1

  override def children: Seq[Expression] = Seq(child)
  // eval returns null for a group that saw no shingles (e.g. all-null
  // child input); declaring nullable=false would let codegen'd
  // consumers read garbage from the unsafe row in that case.
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects a long column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val h = (base * (2L * i + 1) + (7919L * i + 12345L)) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null // no shingles seen
    else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
