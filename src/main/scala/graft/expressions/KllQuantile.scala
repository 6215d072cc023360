package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable KLL-style sketch state: `levels(h)` holds items of weight
  * 2^h; `n` is the true item count; `errBound` is the EXACT worst-case
  * rank error accumulated so far (each compaction at level h adds 2^h
  * — see the compaction analysis on [[KllQuantileAgg]]).
  */
final class KllBuf(
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer()),
    var n: Long = 0L,
    var errBound: Long = 0L)

/** The sketch kernel, shared verbatim by the Catalyst aggregate and
  * the streaming form (streaming.KllStream) so batch and stream
  * cannot drift. All operations are deterministic; only the ORDER of
  * insert/merge calls varies with partitioning, and the errBound
  * invariant holds under any order.
  */
object Kll {

  /** Sort level h, retain its max when the count is odd (weight
    * conservation), promote even indices with doubled weight, clear.
    */
  private def compact(buf: KllBuf, k: Int, h: Int): Unit = {
    val lvl = buf.levels(h)
    if (lvl.size < 2) return
    val arr = lvl.toArray
    java.util.Arrays.sort(arr)
    lvl.clear()
    var c = arr.length
    if (c % 2 == 1) { lvl += arr(c - 1); c -= 1 }
    if (buf.levels.size == h + 1) buf.levels += ArrayBuffer()
    val up = buf.levels(h + 1)
    var i = 0
    while (i < c) { up += arr(i); i += 2 }
    buf.errBound += 1L << h
  }

  private def cascade(buf: KllBuf, k: Int): Unit = {
    var h = 0
    while (h < buf.levels.size) {
      if (buf.levels(h).size >= k) compact(buf, k, h)
      h += 1
    }
  }

  /** Insert one finite value (caller filters NULL/NaN). */
  def insert(buf: KllBuf, k: Int, d: Double): Unit = {
    buf.levels(0) += d
    buf.n += 1
    if (buf.levels(0).size >= k) cascade(buf, k)
  }

  /** Merge b into a (level-wise concat + cascade); b is not reused. */
  def mergeInto(a: KllBuf, b: KllBuf, k: Int): KllBuf = {
    var h = 0
    while (h < b.levels.size) {
      if (a.levels.size == h) a.levels += ArrayBuffer()
      a.levels(h) ++= b.levels(h)
      h += 1
    }
    a.n += b.n
    a.errBound += b.errBound
    cascade(a, k)
    a
  }

  /** Lower-quantile estimates for each q: the smallest sketch value
    * whose cumulative weight reaches max(1, ceil(q·n)). NaN-filled
    * when the sketch is empty.
    */
  def estimates(buf: KllBuf, qs: Seq[Double]): Array[Double] = {
    val ests = new Array[Double](qs.size)
    if (buf.n == 0) {
      java.util.Arrays.fill(ests, Double.NaN)
      return ests
    }
    var total = 0
    buf.levels.foreach(l => total += l.size)
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var idx = 0
    var h = 0
    while (h < buf.levels.size) {
      val lvl = buf.levels(h)
      var i = 0
      while (i < lvl.size) { vs(idx) = lvl(i); ws(idx) = 1L << h; idx += 1; i += 1 }
      h += 1
    }
    val order = (0 until total).sortBy(i => vs(i))
    var qi = 0
    while (qi < qs.size) {
      val target = math.max(1L, math.ceil(qs(qi) * buf.n).toLong)
      var cum = 0L
      var j = 0
      var found = false
      while (j < total && !found) {
        cum += ws(order(j))
        if (cum >= target) { ests(qi) = vs(order(j)); found = true }
        j += 1
      }
      if (!found) ests(qi) = vs(order(total - 1)) // rounding backstop
      qi += 1
    }
    ests
  }

  def serialize(buf: KllBuf): Array[Byte] = {
    var doubles = 0
    buf.levels.foreach(l => doubles += l.size)
    val bb = ByteBuffer.allocate(8 + 8 + 4 + buf.levels.size * 4 + doubles * 8)
    bb.putLong(buf.n)
    bb.putLong(buf.errBound)
    bb.putInt(buf.levels.size)
    buf.levels.foreach { l =>
      bb.putInt(l.size)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): KllBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val err = bb.getLong
    val nLevels = bb.getInt
    val levels = ArrayBuffer[ArrayBuffer[Double]]()
    var h = 0
    while (h < nLevels) {
      val sz = bb.getInt
      val l = new ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { l += bb.getDouble; i += 1 }
      levels += l
      h += 1
    }
    if (levels.isEmpty) levels += ArrayBuffer()
    new KllBuf(levels, n, err)
  }
}

/** Deterministic mergeable quantile sketch (Munro–Paterson / KLL
  * family, with the random compactor offset replaced by a fixed
  * even-index rule so the error bound is a hard invariant, not a
  * probabilistic one).
  *
  * This is the "quantiles without a second pass" answer: ops.Quantile's
  * exact bracketing needs a driver-coordinated multi-round loop, while
  * this sketch is ONE ordinary aggregate — O(k·log(n/k)) state per
  * group, map-side partials, mergeable in any order — usable inside
  * `groupBy(...).agg(...)` and streamable (streaming.KllStream).
  *
  * State: level h holds at most k values, each representing 2^h input
  * rows. When a level fills, its values are sorted and the even-index
  * half is promoted with doubled weight. For any threshold t, a
  * compaction of c items at level h changes the (weighted) rank of t
  * by w·(2·ceil(c_t/2) − c_t) ∈ {0, w} where w = 2^h and c_t = items
  * ≤ t — so each compaction perturbs ANY rank by at most 2^h, and the
  * buffer's `errBound` (the sum of 2^h over compactions actually
  * performed, accumulated across merges) is a deterministic worst-case
  * bound: the sketch rank of any value differs from its true rank by
  * at most `errBound`, under ANY update/merge order. Odd-size
  * compactions retain their maximum at the level (weight must be
  * conserved exactly — promoting ceil(c/2) items would over-count).
  *
  * Totals: errBound ≈ (n/k)·log₂(n/k), i.e. relative rank error
  * ~ log₂(n/k)/k — k=512 holds ~2.5 % at n=10⁹ per group. The output
  * quantile estimate `est(q)` is the smallest sketch value whose
  * cumulative weight reaches max(1, ceil(q·n)) — the same lower-
  * quantile convention as [[graft.ops.Quantile]].
  *
  * Output struct: (n BIGINT, err_bound BIGINT, est ARRAY<DOUBLE> — one
  * entry per requested q). Estimates depend on Spark's merge order and
  * are NOT hash-stable run-to-run; downstream gates compare the
  * deterministic guarantee (true rank within err_bound of the target),
  * not the raw estimate. NULL/NaN inputs are skipped (finite-only
  * convention of ops.Quantile; ±Inf sort correctly and are kept).
  *
  * Reference ground: the reference computes percentiles exactly in
  * DuckDB SQL (apps/ SQL paths); the mergeable sketch is the 100 TB
  * single-pass addition this engine provides beyond it.
  */
case class KllQuantileAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuf] {

  require(k >= 8 && k % 2 == 0, s"kll needs even k >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
    s"quantiles must be in (0, 1]: $qs")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("est", ArrayType(DoubleType), nullable = false)))
  override def prettyName: String = "kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects a double column, got ${child.dataType}")

  override def createAggregationBuffer(): KllBuf = new KllBuf()

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) Kll.insert(buf, k, d)
    }
    buf
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = Kll.mergeInto(a, b, k)

  override def eval(buf: KllBuf): Any =
    InternalRow(buf.n, buf.errBound,
      new GenericArrayData(Kll.estimates(buf, qs)))

  override def serialize(buf: KllBuf): Array[Byte] = Kll.serialize(buf)

  override def deserialize(bytes: Array[Byte]): KllBuf =
    Kll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
