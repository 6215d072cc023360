package graft.expressions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact decimal second-moment sums for PCA — Σx_i (d entries) and
  * Σx_i·x_j over the upper triangle (d(d+1)/2 entries), plus the row
  * count, in ONE mergeable aggregate.
  *
  * Why an imperative aggregate: the explode formulation
  * (posexplode of the per-row upper-triangle array → hash aggregate
  * on position) shuffles d(d+1)/2 rows PER INPUT ROW — 4.3M exchange
  * rows at sf0.1/d=64, which made the PCA fit a top-5 bench query.
  * Here the partial state is the d(d+1)/2+d decimal sums themselves:
  * the exchange carries one ~36 KB buffer per partition instead, and
  * the scan stays a single pass. State is O(d²) — bounded by the
  * embedding width, the same driver-bounded-model contract as the
  * eigen step that consumes it.
  *
  * Determinism contract (the reason these are decimals at all): each
  * per-row product is converted exactly like Spark's double→DECIMAL
  * (38,18) cast — BigDecimal.valueOf (shortest decimal form) then
  * setScale(18, HALF_UP) — and decimal addition is associative and
  * commutative, so the sums (and the whole eigen chain downstream)
  * are bit-identical under any partitioning, matching the previous
  * explode+`sum(cast(...))` formulation term for term (PcaSpec pins
  * repartition-invariance).
  *
  * Input rows must share one dimension; a ragged row throws (the
  * explode form detected this via mismatched position counts).
  * Returns struct(n BIGINT, sums ARRAY<DECIMAL(38,18)>) with sums =
  * [mean sums (d), upper-triangle products row-major (i ≤ j)].
  */
object OuterProductSumAgg {
  final class Buf(var n: Long, var d: Int, var sums: Array[JBigDecimal])

  private[expressions] def toDec(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(18, RoundingMode.HALF_UP)
}

case class OuterProductSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[OuterProductSumAgg.Buf] {
  import OuterProductSumAgg.{toDec, Buf}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "outer_product_sum"

  private val decType = DecimalType(38, 18)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(decType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"outer_product_sum expects array<double>, got $t")
  }

  override def createAggregationBuffer(): Buf = new Buf(0L, -1, null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (d > 0) {
        if (buf.d == -1) {
          buf.d = d
          buf.sums = Array.fill(d + d * (d + 1) / 2)(JBigDecimal.ZERO)
        }
        require(d == buf.d,
          s"outer_product_sum: ragged embedding dimensions ($d vs ${buf.d})")
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = arr.getDouble(i); i += 1 }
        var k = d
        i = 0
        while (i < d) {
          buf.sums(i) = buf.sums(i).add(toDec(x(i)))
          var j = i
          while (j < d) {
            buf.sums(k) = buf.sums(k).add(toDec(x(i) * x(j)))
            j += 1; k += 1
          }
          i += 1
        }
        buf.n += 1L
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.d == -1) a
    else if (a.d == -1) b
    else {
      require(a.d == b.d,
        s"outer_product_sum: ragged embedding dimensions (${a.d} vs ${b.d})")
      var i = 0
      while (i < a.sums.length) { a.sums(i) = a.sums(i).add(b.sums(i)); i += 1 }
      a.n += b.n
      a
    }
  }

  override def eval(buf: Buf): Any = {
    val sums: Array[Any] =
      if (buf.d == -1) Array.empty
      else buf.sums.map(s => Decimal(s, 38, 18): Any)
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(sums)))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    if (buf.d == -1) return Array[Byte](0)
    val parts = buf.sums.map(_.unscaledValue().toByteArray)
    val bb = ByteBuffer.allocate(1 + 8 + 4 + parts.map(_.length + 4).sum)
    bb.put(1.toByte).putLong(buf.n).putInt(buf.d)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 0.toByte) new Buf(0L, -1, null)
    else {
      val n = bb.getLong
      val d = bb.getInt
      val sums = Array.fill(d + d * (d + 1) / 2) {
        val len = bb.getInt
        val p = new Array[Byte](len)
        bb.get(p)
        new JBigDecimal(new BigInteger(p), 18)
      }
      new Buf(n, d, sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
