package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch: one pass, at most `capacity`
  * counters of state, mergeable. Returns the surviving CANDIDATE
  * items — a guaranteed superset of every item with frequency
  * > n/(capacity+1) (the classic MG bound; merging preserves it:
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The intended use is the two-phase exact-top-k at corpus scale
  * (TextQueries.heavy_hitters_mg): phase 1 runs this sketch — bounded
  * state per partition, no vocabulary-sized shuffle; phase 2
  * exact-counts only the ≤capacity candidates via a broadcast semi
  * join. The final (item, count) output is EXACT whenever the true
  * k-th item clears the MG bound, which the caller controls by sizing
  * `capacity` — so the end-to-end result is deterministic and
  * oracle-checkable even though the sketch's internal counts are
  * merge-order-dependent (which is why eval returns items only,
  * never its approximate counts).
  */
case class FrequentItems(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity >= 1, s"frequent_items needs capacity >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false // empty group => empty array
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "frequent_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"frequent_items expects a string column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** MG step: increment if tracked or free slot, else decrement all
    * (implemented lazily: subtract the minimum count when full and
    * drop zeros — the standard batched-decrement variant).
    */
  private def offer(buf: mutable.HashMap[UTF8String, Long],
                    item: UTF8String, weight: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + weight)
      case None if buf.size < capacity => buf.update(item, weight)
      case None =>
        val dec = math.min(weight, buf.valuesIterator.min)
        // one filterInPlace pass decrements every counter; the item
        // itself enters only if its weight survives the decrement
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.filterInPlace((_, c) => c > 0)
        if (weight > dec) buf.update(item, weight - dec)
    }
  }

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (item, c) => offer(a, item, c) }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    // sorted for a deterministic array independent of hash-map order
    new GenericArrayData(
      buf.keysIterator.toArray.sortBy(_.toString).map(x => x: Any))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
