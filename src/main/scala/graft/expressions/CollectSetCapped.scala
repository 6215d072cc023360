package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Size-capped collect_set over long ids: the hot-bucket-safe
  * aggregation core of the group-then-pair candidate generators.
  *
  * Plain `collect_set → filter(size ≤ cap)` bounds the pair OUTPUT but
  * not the aggregation STATE: one adversarial bucket (a boilerplate
  * shingle shared by 100M docs, an empty-text length band) holds its
  * entire id set in one buffer before the filter discards it — an
  * OOM at 100× test scale. This aggregate enforces the cap where the
  * memory lives: the buffer holds at most cap+1 distinct ids; the
  * first id past that flips an overflow flag and CLEARS the set, so a
  * hot bucket's state collapses to one boolean (and its shuffle
  * payload to one byte) the moment it exceeds the cap. Merges of
  * partial buffers propagate overflow the same way, so map-side
  * partial aggregation keeps working. Overflowed groups evaluate to
  * NULL — exactly the groups `filter(size ≤ cap)` would drop, so
  * `WHERE result IS NOT NULL` preserves results bit-for-bit while the
  * worst-case buffer is O(cap) regardless of skew.
  *
  * Output is the ascending-sorted id array (TreeSet iteration order):
  * callers get `sort_array(collect_set(...))` semantics for free.
  */
case class CollectSetCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CollectSetCapped.Buffer] {

  require(cap >= 1, s"collect_set_capped needs cap >= 1, got $cap")

  override def children: Seq[Expression] = Seq(child)
  // overflowed groups evaluate to null (callers filter them)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "collect_set_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"collect_set_capped expects a long id column, got ${child.dataType}")

  override def createAggregationBuffer(): CollectSetCapped.Buffer =
    new CollectSetCapped.Buffer(new java.util.TreeSet[java.lang.Long](), false)

  private def add(buf: CollectSetCapped.Buffer, h: Long): Unit =
    if (!buf.overflowed) {
      buf.set.add(h)
      if (buf.set.size > cap) { buf.set.clear(); buf.overflowed = true }
    }

  override def update(buf: CollectSetCapped.Buffer,
                      input: InternalRow): CollectSetCapped.Buffer = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CollectSetCapped.Buffer,
                     b: CollectSetCapped.Buffer): CollectSetCapped.Buffer = {
    if (b.overflowed) { a.set.clear(); a.overflowed = true }
    else {
      val it = b.set.iterator()
      while (it.hasNext && !a.overflowed) add(a, it.next())
    }
    a
  }

  override def eval(buf: CollectSetCapped.Buffer): Any =
    if (buf.overflowed) null
    else {
      val out = new Array[Long](buf.set.size)
      val it = buf.set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: CollectSetCapped.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.set.size)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CollectSetCapped.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val overflowed = bb.get() == 1.toByte
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    new CollectSetCapped.Buffer(s, overflowed)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CollectSetCapped {
  /** Mutable agg state: ≤ cap+1 distinct ids, or an overflow marker
    * with an EMPTY set (hot buckets cost one boolean, not their ids).
    */
  final class Buffer(val set: java.util.TreeSet[java.lang.Long],
                     var overflowed: Boolean)
}
