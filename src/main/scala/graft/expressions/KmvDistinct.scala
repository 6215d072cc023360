package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a Catalyst
  * aggregate. Input: the 60-bit uniform hash of the value being
  * counted (GraftFunctions.hash60 — md5 in oracle mode, xxhash64 in
  * production mode). Buffer: the k smallest DISTINCT hashes seen so
  * far — O(k) state per group, mergeable by union-then-trim, so
  * map-side partial aggregation works exactly like any built-in agg
  * and the shuffle carries at most k longs per (group, partition).
  *
  * This is the streaming/at-scale answer to COUNT(DISTINCT x): exact
  * distinct forces either a two-phase expand or a full shuffle of the
  * raw keys, while the sketch is one pass, one narrow merge, and
  * error ~ 1/sqrt(k-2) (≈12.5 % at k=64, ≈3 % at k=1024).
  *
  * Estimator (Bar-Yossef et al. 2002; also the DataSketches "KMV /
  * bottom-k" theta sketch): with hashes uniform on [0, 2^60), if the
  * group saw fewer than k distinct hashes the count is EXACT (the
  * buffer holds them all); otherwise D ≈ (k-1) * 2^60 / h_(k) where
  * h_(k) is the k-th smallest hash. The estimate is computed in IEEE
  * double (long→double cast, one multiply, one divide, floor), every
  * step of which is exactly specified by IEEE 754, so DuckDB evaluates
  * the identical SQL to the identical BIGINT — the sketch is
  * hash-compare reproducible cross-engine, unlike HLL whose register
  * layout is engine-private.
  *
  * Reference ground: the reference counts distincts exactly
  * (src/pipeline SQL paths); the sketch is the 100 TB-scale addition
  * this engine provides beyond it.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  /** Hash domain: hash60 yields values in [0, 2^60). Exact in double
    * (2^60 has a 1-bit mantissa); written as a literal so the SQL
    * oracle can use the same constant without trusting pow().
    */
  private val M: Double = 1152921504606846976d // 2^60

  override def children: Seq[Expression] = Seq(child)
  // empty group => 0 distinct, never null
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a long hash column, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size < k) a.add(h)
      else if (h < a.last) { a.add(h); if (a.size > k) a.pollLast() }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong // saw everything: exact
    else math.floor((k - 1).toDouble * M / buf.last.toDouble).toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
