package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership pruning for incremental ingest: probe a
  * compact sketch of the known corpus before paying the exact anti
  * join. At 100 TB the known fingerprint set is billions of rows; the
  * sketch is a few GB at 1% fpp and ships to executors once, so the
  * overwhelmingly-new portion of a fresh crawl never shuffles at all —
  * only the ~fpp fraction of false-positive candidates (plus true
  * dups) reach the exact join. The result is EXACT: bloom filters
  * have no false negatives, and every "maybe" row is re-checked.
  */
object Bloom {

  /** Distributed build (treeAggregate under Dataset.stat): one pass
    * over `df`, no shuffle. `expectedItems` sizes the bit array —
    * overshooting costs memory, undershooting costs fpp, never
    * correctness.
    */
  def fit(df: DataFrame, item: Column,
          expectedItems: Long, fpp: Double = 0.03): BloomFilter =
    df.stat.bloomFilter(item, expectedItems, fpp)

  /** Scan-time membership probe (codegen'd; see
    * expressions.BloomMightContain).
    */
  def mightContain(filter: BloomFilter, item: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.BloomMightContain(expression(item), filter))
  }

  /** Exact anti join with a bloom pre-filter: rows whose key the
    * sketch has never seen are definitely-new and bypass the join;
    * only might-contain rows pay the shuffle for the exact check.
    * Equivalent to `left.join(right, leftKey === rightKey,
    * "left_anti")` for non-null keys.
    */
  def antiJoinBloom(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val filter = fit(right, col(rightKey), expectedItems, fpp)
    val probed = left.withColumn("__maybe", mightContain(filter, col(leftKey)))
    val definiteNew = probed.where(!col("__maybe"))
    val candidates = probed.where(col("__maybe"))
      .join(right.select(col(rightKey)),
        col(leftKey) === col(rightKey), "left_anti")
    definiteNew.union(candidates).drop("__maybe")
  }
}
