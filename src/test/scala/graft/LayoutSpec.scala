package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey2 interleaves bits (known value + bijectivity)") {
    // a=5 (101) → z bits 0,4 = 17; b=3 (011) → z bits 1,3 = 10; z = 27
    val grid = (for (a <- 0 to 7; b <- 0 to 7) yield (a, b)).toDF("a", "b")
    val keys = grid.select(col("a"), col("b"),
        Layout.zorderKey2(col("a"), col("b"), 3).as("z"))
      .as[(Int, Int, Long)].collect()
    val m = keys.map { case (a, b, z) => (a, b) -> z }.toMap
    assert(m((5, 3)) == 27L)
    assert(m((0, 0)) == 0L && m((7, 7)) == 63L)
    // bijective on the 3-bit × 3-bit grid
    assert(keys.map(_._3).toSet.size == 64)
  }

  test("zorderKey2 masks dimensions beyond `bits`") {
    val one = Seq((65536 + 5, 3)).toDF("a", "b")
      .select(Layout.zorderKey2(col("a"), col("b"), 3).as("z"))
      .as[Long].head()
    assert(one == 27L) // bit 16 of a is outside bits=3 and must not leak
  }

  test("range partitioning on zkey yields non-overlapping key ranges") {
    val df = (0 until 4096).map(i => (i % 64, i / 64)).toDF("a", "b")
      .withColumn("z", Layout.zorderKey2(col("a"), col("b"), 6))
    val ranges = df.repartitionByRange(4, col("z"))
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("writeZordered round-trips rows and prunes on both dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = (0 until 2000).map(i => (i * 37 % 256, i * 91 % 256, i))
      .toDF("x", "y", "payload")
    Layout.writeZordered(df, col("x"), col("y"), 8, files = 8, path = s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 2000)
    assert(back.columns.sorted.toSeq == Seq("payload", "x", "y"))
    // Pruning semantics: a file is skipped when its [min,max] misses
    // the predicate range. Range-quantile boundaries can straddle a
    // z quadrant (so single-file spans are not tight), but a narrow
    // predicate on EITHER dimension must still skip a decent share of
    // files — that's the property the layout exists for. A
    // single-column sort would prune only its own column.
    val st = back.select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg(min("x").as("xlo"), max("x").as("xhi"),
        min("y").as("ylo"), max("y").as("yhi"))
      .as[(String, Int, Int, Int, Int)].collect()
    assert(st.length >= 4, s"expected several files, got ${st.length}")
    val hitX = st.count { case (_, xlo, xhi, _, _) => xlo < 32 && xhi >= 0 }
    val hitY = st.count { case (_, _, _, ylo, yhi) => ylo < 32 && yhi >= 0 }
    assert(hitX <= st.length / 2, s"x<32 hits $hitX of ${st.length} files")
    assert(hitY <= st.length / 2, s"y<32 hits $hitY of ${st.length} files")
  }

  test("compact sizes output files from plan stats and preserves rows") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val d = Tables.load(spark, sfDir, "documents")
    // simulate fine-grained ingest: 64 tiny files
    d.repartition(64).write.mode("overwrite").parquet(s"$dir/small")
    val small = spark.read.parquet(s"$dir/small")
    val nSmallFiles = new java.io.File(s"$dir/small")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nSmallFiles >= 32, s"expected many small files, got $nSmallFiles")

    Layout.compact(small, targetBytes = 512 * 1024)
      .write.mode("overwrite").parquet(s"$dir/big")
    val big = spark.read.parquet(s"$dir/big")
    val nBigFiles = new java.io.File(s"$dir/big")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nBigFiles < nSmallFiles / 4,
      s"compaction left $nBigFiles files (from $nSmallFiles)")
    assert(big.count() == d.count())
    // content identical, not just counts
    assert(big.select(col("doc_id")).as[Long].collect().sorted
      .sameElements(d.select(col("doc_id")).as[Long].collect().sorted))
  }

  test("compact rejects unusable (default/inflated) plan-size estimates instead of wrapping") {
    // non-equi join estimates multiply the side sizes — here past
    // Long.MaxValue, the regime where the old .toInt wrapped to an
    // arbitrary 32-bit count. Nothing executes: compact() reads stats
    // and must fail loudly in BigInt space. (8 GB × 8 GB estimate.)
    val a = spark.range(1L << 30)
    val big = a.join(a.withColumnRenamed("id", "id2"),
      org.apache.spark.sql.functions.expr("id != id2"))
    val stats = big.queryExecution.optimizedPlan.stats.sizeInBytes
    assume(stats >= Layout.UnusableStatsBytes,
      s"join estimate unexpectedly small: $stats")
    val ex = intercept[IllegalArgumentException](
      Layout.compact(big, 128L * 1024 * 1024))
    assert(ex.getMessage.contains("stats"))
  }

  test("compact clamps a legitimately large estimate to maxPartitions instead of failing") {
    // ~8.8 TB of relation-backed stats with a 1 KB target implies
    // billions of files — a VALID job shape (100 TB at 64 MB is
    // ~1.6M files), so it must clamp to the caller's ceiling, not be
    // mistaken for the missing-stats sentinel. Nothing executes:
    // only the LOGICAL plan's partition count is inspected (.rdd
    // would let AQE materialize the 2^40-row shuffle map stage).
    val big = spark.range(1L << 40)
    val stats = big.queryExecution.optimizedPlan.stats.sizeInBytes
    assume(stats < Layout.UnusableStatsBytes && stats > BigInt(1L << 42),
      s"range estimate out of expected band: $stats")
    val out = Layout.compact(big.toDF(), targetBytes = 1024,
      maxPartitions = 4096)
    val reps = out.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition =>
        r.numPartitions
    }
    assert(reps == Seq(4096), s"expected one Repartition(4096): $reps")
  }

  test("layout_pruning_census: z-order prunes the 2-D predicate best, " +
    "natural layout reads everything") {
    // sf0.01: at sf0.001 blocks hold ~6 rows and the Morton tiles are
    // too sparse for the layout physics to show (bydate's single
    // selective band wins on noise) — the census needs real density
    val rows = SparkEntry.queries("layout_pruning_census")(
        spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(rows.keySet == Set("natural", "bydate", "zorder"))
    // every layout holds the same rows; scanned ⊆ total
    val totals = rows.values.map(_._3).toSet
    assert(totals.size == 1)
    rows.values.foreach { case (nb, sb, nr, sr, frac) =>
      assert(sb <= nb && sr <= nr && frac >= 0.0 && frac <= 1.0)
    }
    // natural = insertion order is uncorrelated with both predicate
    // columns, so its min/max stats prune worst (at sf0.01+ it reads
    // exactly 1.0 of the rows; at sf0.001 blocks hold ~6 rows and a
    // lucky narrow block occasionally falls outside the date band)
    assert(rows("natural")._5 >= rows("bydate")._5)
    assert(rows("natural")._5 >= rows("zorder")._5)
    // the single-column sort prunes; the Morton tiles prune at least
    // as well on the combined predicate
    assert(rows("bydate")._5 < 0.5)
    assert(rows("zorder")._5 <= rows("bydate")._5)
  }
}
