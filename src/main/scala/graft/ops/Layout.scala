package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys.
  *
  * Parquet scan pruning is driven by per-file (and per-row-group)
  * min/max statistics, so a table sorted on one column prunes only
  * that column's predicates. Interleaving the bits of two dimensions
  * into a Z-order (Morton) key and range-partitioning + sorting on it
  * keeps BOTH dimensions locally clustered — point/range predicates on
  * either column skip most files. This is the standard layout lever
  * for scan-heavy corpora queried along two axes (e.g. customer ×
  * date): at 100 TB the win is file-count, not CPU.
  *
  * The key is a pure scan-time expression (shift/and/or — whole-stage
  * codegen), so computing it costs one projection; the layout cost is
  * the one range-partition exchange at write time.
  */
object Layout {

  /** Morton/Z-order key of two non-negative int dimensions, `bits`
    * bits each (bits ≤ 31; the result uses 2·bits bits of a long).
    * Dimension values are masked to `bits` bits — callers normalize
    * (bucket/quantize) each dimension into that range first.
    * a occupies even bit positions, b odd.
    */
  def zorderKey2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val aa = a.cast("long")
    val bb = b.cast("long")
    (0 until bits).map { k =>
      val abit = shiftleft(shiftrightunsigned(aa, k).bitwiseAND(lit(1L)), 2 * k)
      val bbit = shiftleft(shiftrightunsigned(bb, k).bitwiseAND(lit(1L)), 2 * k + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB mirror of zorderKey2 for oracle SQL (same shift/and/or
    * arithmetic, so both engines compute bit-identical keys).
    */
  def zorderKey2Sql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).map { k =>
      s"(((($a)::BIGINT >> $k) & 1) << ${2 * k}) | (((($b)::BIGINT >> $k) & 1) << ${2 * k + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Write `df` clustered on the Z-order of two dimensions: range
    * partition on the key (contiguous key ranges per output file),
    * sort within partitions, drop the helper column. `files` ≈
    * target size / 128 MB at scale.
    */
  def writeZordered(df: DataFrame, a: Column, b: Column, bits: Int,
                    files: Int, path: String): Unit =
    df.withColumn("__zkey", zorderKey2(a, b, bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction: size the output file count from the
    * plan's own statistics (for a file scan, the source bytes) so
    * each output file lands near `targetBytes`. The other half of the
    * layout story: streaming ingest and fine-grained upserts leave
    * thousands of KB-scale files whose open/footer cost dominates the
    * scan at 100 TB; periodic compaction to ~128 MB–1 GB files
    * restores scan efficiency. Returns the repartitioned frame —
    * callers choose the sink (plain parquet, or writeZordered to
    * re-cluster while compacting).
    */
  /** Default partition-count ceiling for [[compact]] — overridable
    * per call (`maxPartitions`): a legitimately huge input with a
    * small target (100 TB at 64 MB ≈ 1.6M files) is a valid job, just
    * one the caller should size consciously.
    */
  val MaxCompactPartitions = 1 << 20

  /** Byte estimates at or past this bound are treated as the
    * missing-stats sentinel, not data: Spark's default `sizeInBytes`
    * for a statless relation is Long.MaxValue, and non-equi join
    * estimates MULTIPLY side sizes past it — while no real dataset's
    * relation-backed stats approach 4.6 exabytes (Long.MaxValue/2).
    * Failing only here keeps genuinely large-but-real estimates
    * usable (they clamp to `maxPartitions` instead of erroring).
    */
  val UnusableStatsBytes: BigInt = BigInt(Long.MaxValue) / 2

  def compact(df: DataFrame, targetBytes: Long,
              maxPartitions: Int = MaxCompactPartitions): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(maxPartitions > 0, s"maxPartitions must be positive: $maxPartitions")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // fail ONLY on sentinel-class estimates (default sizeInBytes /
    // overflowed join products) — an unclamped BigInt→Int conversion
    // would wrap to an arbitrary 32-bit value and compact 100 TB into
    // garbage partitioning. Large-but-real estimates clamp instead.
    require(bytes < UnusableStatsBytes,
      s"plan size estimate $bytes B is in the missing-stats sentinel range " +
        "(default sizeInBytes is Long.MaxValue; join estimates multiply " +
        "past it) — compact() needs a relation-backed estimate")
    val files = ((bytes + targetBytes - 1) / targetBytes)
      .min(BigInt(maxPartitions)).max(BigInt(1))
    df.repartition(files.toInt)
  }
}
