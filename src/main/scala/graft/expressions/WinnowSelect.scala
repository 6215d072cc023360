package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection over a positional gram-hash array
  * (Schleimer, Wilkerson & Aiken 2003 — the MOSS rule): pack each
  * hash with its reversed position (packed = (h mod 2^43)·2^20 +
  * (2^20−1−pos), so min(packed) IS argmin(hash asc, pos desc) and the
  * max value 2^63−1 exactly fills a signed long), take the minimum of
  * every w-length window, return the distinct selections.
  *
  * Why a custom Expression (SURVEY §7.3 preference (b)): the
  * composed-builtins form — `transform(sequence(...), i ->
  * array_min(slice(packed, i+1, w)))` — re-evaluates the ENTIRE
  * packed/gram-hash subtree once per window after CollapseProject
  * inlines the single-use alias into the lambda body, turning the
  * per-document cost from O(m) hashes into O(m²): measured 402 s for
  * the per-doc report at sf0.1 vs ~1 s through this kernel. The
  * kernel is also asymptotically better than any slice form — a
  * monotonic deque gives the sliding minimum in O(m) total, not
  * O(m·w) — and stays inside whole-stage codegen via a static call.
  *
  * Input contract: child is the POSITIONAL (non-distinct) gram-hash
  * array in document order (WordShingleHashes distinct=false), values
  * in [0, 2^60). Fewer than w hashes winnow one truncated window
  * (≥ 1 fingerprint for any non-empty gram array); an empty array
  * selects nothing.
  *
  * Documents with ≥ 2^20 grams: the reversed-position component is
  * CLAMPED at 0 from gram 2^20−1 onward (`max(2^20−1−pos, 0)`), so the
  * packing never underflows into the hash bits and `>>> 20` hash
  * recovery stays exact at any document length. Beyond the clamp
  * point the (hash asc, pos desc) tie rule degrades to (hash asc,
  * arbitrary-tail-pos) — the selected HASH set is unaffected (ties
  * only arise between equal hashes), only which occurrence "won" is
  * unspecified, and the MOSS detection/density guarantees still hold.
  * The DuckDB mirror (DedupQueries.winnowSelSql) clamps identically.
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {

  require(w > 0, "winnow window must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_select expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override protected def nullSafeEval(input: Any): Any =
    WinnowOps.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WinnowOps.select($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowOps {

  private val HashMod = 1L << 43
  private val PosMod = 1L << 20

  /** Plain-JVM winnow fingerprint HASHES of a text (k-word grams,
    * window w) — the per-row twin streams use, sharing
    * MinHashLocal's gram hashing and this object's selection, so
    * stream and batch fingerprints are bit-identical (the
    * MinHashStream/MinHashLocal discipline). Null-safe (null text
    * selects nothing, mirroring the batch column's null propagation),
    * and lowercasing goes through UTF8String — the SAME code path as
    * the batch `lower()` — so non-ASCII text cannot diverge under a
    * non-ROOT default locale.
    */
  def selectHashes(text: String, k: Int, w: Int, xx: Boolean): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val hashes = graft.streaming.MinHashLocal
      .shingleHashesAll(lowered, k, xx)
    val sel = select(UnsafeArrayData.fromPrimitiveArray(hashes), w)
    val n = sel.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(sel.getLong(i) >>> 20); i += 1 }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    res
  }

  /** Distinct sliding-window minima of the packed (hash, reversed-pos)
    * array — one monotonic-deque pass, first-appearance order.
    */
  def select(hashes: ArrayData, w: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val packed = new Array[Long](m)
    var i = 0
    while (i < m) {
      // position clamped at 0 beyond 2^20 grams (see class scaladoc):
      // the pack must never borrow into the hash bits
      val rev = PosMod - 1 - i
      packed(i) = (hashes.getLong(i) % HashMod) * PosMod +
        (if (rev > 0L) rev else 0L)
      i += 1
    }
    // deque of candidate indices, packed values increasing front→back;
    // below the clamp point ties cannot occur (positions differ), and
    // past it the strict > pop keeps the earliest tied index — the
    // window-minimum VALUE is correct either way
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && packed(deque(tail - 1)) > packed(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1 // left edge fell out of window
      // a full window ends at every i ≥ w−1; a doc with m < w grams
      // winnows its single truncated window at i = m−1
      if (i >= w - 1 || i == m - 1) out.add(packed(deque(head)))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}
