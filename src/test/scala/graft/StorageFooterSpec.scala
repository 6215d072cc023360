package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Storage-footer pruning census (VERDICT r10 #6): the
  * layout_pruning_census GATE simulates blocks from in-memory stats;
  * this spec writes the SAME three layouts (natural / bydate /
  * zorder) as real parquet, reads the REAL row-group footers with the
  * driver-side ParquetFileReader, and pins (a) the rows a min/max-
  * pruned scan of the 2-D predicate must read per layout, (b) the
  * BYTES a 2-column projection of that pruned scan reads, and (c)
  * that the footer stats agree with an independent reader (DuckDB's
  * parquet_metadata(), via the driver-only python toolchain — skipped
  * if absent). This turns the census claim ("z-order reads a few
  * percent; a single-column sort prunes only its own column") from a
  * simulated number into one measured off actual file metadata.
  */
class StorageFooterSpec extends SparkSpec {

  /** One row group's footer facts: row count, per-column compressed
    * bytes, per-column long min/max.
    */
  private case class Rg(file: String, rows: Long,
                        bytes: Map[String, Long],
                        lo: Map[String, Long], hi: Map[String, Long])

  private def footers(dir: String): Seq[Rg] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.nonEmpty, s"no parquet files under $dir")
    files.toSeq.flatMap { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try r.getFooter.getBlocks.asScala.toSeq.map { bm =>
        val cols = bm.getColumns.asScala.toSeq
        def byCol[T](g: org.apache.parquet.hadoop.metadata
            .ColumnChunkMetaData => T): Map[String, T] =
          cols.map(c => c.getPath.toDotString -> g(c)).toMap
        Rg(new java.io.File(f).getName, bm.getRowCount,
          byCol(_.getTotalSize),
          byCol(_.getStatistics.genericGetMin
            .asInstanceOf[java.lang.Long].longValue()),
          byCol(_.getStatistics.genericGetMax
            .asInstanceOf[java.lang.Long].longValue()))
      } finally r.close()
    }
  }

  // sf0.01 orders (15k rows) cut into 32 range-partitioned files per
  // layout — enough row groups that footer pruning has real teeth
  private val SfDir = "/root/testdata/sf0.01"
  private val Files = 32

  private lazy val layoutDirs: Map[String, String] = {
    val base = java.nio.file.Files.createTempDirectory("footer").toString
    val day = expr(
      "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    val keyed = Tables.load(spark, SfDir, "orders")
      .select(col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("cust"), day.as("day"))
      .withColumn("zkey", Layout.zorderKey2(
        col("cust").bitwiseAND(lit(65535L)),
        col("day").bitwiseAND(lit(65535L)), 16))
    Seq("natural" -> "okey", "bydate" -> "day", "zorder" -> "zkey")
      .map { case (name, key) =>
        val dir = s"$base/$name"
        keyed.repartitionByRange(Files, col(key))
          .sortWithinPartitions(col(key))
          .write.parquet(dir)
        name -> dir
      }.toMap
  }

  /** The census's own 2-D predicate, derived from the table so the
    * spec is scale-free: cust ∈ [1, max/10], day ∈ [min+300, min+500].
    */
  private lazy val (cLo, cHi, dLo, dHi) = {
    val st = Tables.load(spark, SfDir, "orders")
      .select(col("o_custkey").cast("long").as("cust"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
      .agg(max("cust"), min("day")).head()
    (1L, st.getLong(0) / 10, st.getLong(1) + 300, st.getLong(1) + 500)
  }

  private def scanned(rg: Rg): Boolean =
    rg.lo("cust") <= cHi && rg.hi("cust") >= cLo &&
      rg.lo("day") <= dHi && rg.hi("day") >= dLo

  /** cust-band-only predicate — the one a date sort CANNOT prune. */
  private def scannedCustOnly(rg: Rg): Boolean =
    rg.lo("cust") <= cHi && rg.hi("cust") >= cLo

  test("row-group min/max pruning: each sort prunes its own column, " +
    "z-order prunes both — measured from REAL footers") {
    val stats = layoutDirs.map { case (n, d) => n -> footers(d) }
    val total = stats("natural").map(_.rows).sum
    stats.values.foreach(s => assert(s.map(_.rows).sum == total))
    def frac(pred: Rg => Boolean) = stats.map { case (n, rgs) =>
      n -> rgs.filter(pred).map(_.rows).sum.toDouble / total
    }
    val f2d = frac(scanned)
    val fc = frac(scannedCustOnly)
    info(s"rows-scanned fraction, 2-D predicate: $f2d")
    info(s"rows-scanned fraction, cust-only predicate: $fc")
    // natural order: cust and day are uncorrelated with okey, so
    // every row group straddles both bands — no pruning at all
    assert(f2d("natural") > 0.95, s"natural should scan ~all: $f2d")
    // a date sort prunes the 200-day band...
    assert(f2d("bydate") < 0.25, s"bydate should prune the date band: $f2d")
    // ...but is BLIND to a cust band — that's the single-column-sort
    // failure mode the z-order layout exists to fix
    assert(fc("bydate") > 0.95, s"bydate cannot prune cust: $fc")
    assert(fc("zorder") < 0.5,
      s"zorder must prune the cust band bydate cannot: $fc")
    // on the 2-D predicate z-order is at least as good as the best
    // single sort (at this tile granularity the day band dominates
    // both; the gated 256-block census shows the finer-grained gap)
    assert(f2d("zorder") <= f2d("bydate") + 0.01 && f2d("zorder") < 0.15,
      s"zorder must match-or-beat the single sorts: $f2d")
  }

  test("bytes read by a 2-column projection of the pruned scan — " +
    "the footer-gated version of the 'few percent of storage' claim") {
    val proj = Set("cust", "day")
    val byteFrac = layoutDirs.map { case (n, d) =>
      val rgs = footers(d)
      val all = rgs.map(_.bytes.values.sum).sum.toDouble
      val read = rgs.filter(scanned)
        .map(_.bytes.filter(kv => proj(kv._1)).values.sum).sum
      n -> read / all
    }
    info(s"projected+pruned bytes fraction: $byteFrac")
    // column pruning alone caps the read at the 2 columns' share;
    // row-group pruning multiplies — z-order must land well under
    // a tenth of the stored bytes, natural pays the full 2-column
    // share (ceiling ~60%: 2 of 4 columns, sizes uneven). NO
    // cross-layout bytes ordering is asserted between bydate and
    // zorder: sorting a column shrinks ITS compressed chunks, so
    // bydate's day chunks are smaller per row group than zorder's —
    // a real-footer effect the row-count census can't see (measured:
    // bydate 0.038 vs zorder 0.043 here despite equal row pruning).
    assert(byteFrac("natural") < 0.65 && byteFrac("natural") > 0.2,
      s"natural reads the full 2-column share: $byteFrac")
    assert(byteFrac("zorder") < 0.10,
      s"zorder + projection must be <10% of stored bytes: $byteFrac")
  }

  test("footer stats agree with DuckDB parquet_metadata() (skipped " +
    "when the driver-side python toolchain is absent)") {
    val dir = layoutDirs("zorder")
    val py =
      s"""import glob, sys
         |try:
         |    import duckdb
         |except Exception:
         |    print("SKIP"); sys.exit(0)
         |con = duckdb.connect()
         |rows = con.execute(
         |    "SELECT file_name, row_group_id, path_in_schema, "
         |    "stats_min_value, stats_max_value "
         |    "FROM parquet_metadata('$dir/*.parquet') "
         |    "WHERE path_in_schema IN ('cust', 'day')").fetchall()
         |for f, rg, c, mn, mx in sorted(rows):
         |    print("%s|%s|%s|%s|%s" % (f.split('/')[-1], rg, c, mn, mx))
         |""".stripMargin
    val tmp = java.nio.file.Files.createTempFile("footer_oracle", ".py")
    java.nio.file.Files.writeString(tmp, py)
    val p = new ProcessBuilder("python3", tmp.toString)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      "python oracle timed out")
    assume(!out.startsWith("SKIP") && p.exitValue() == 0,
      s"duckdb unavailable: ${out.take(200)}")
    val duck = out.linesIterator.filter(_.contains("|")).map { l =>
      val Array(f, rg, c, mn, mx) = l.split('|')
      (f, rg.toInt, c) -> (mn.toLong, mx.toLong)
    }.toMap
    val mine = footers(dir).zipWithIndex.flatMap { case (rg, _) =>
      Seq("cust", "day").map(c =>
        // Spark writes one row group per file at this size, so the
        // (file, rg=0) key matches; a multi-RG file would need the
        // index threaded through `footers`
        (rg.file, 0, c) -> (rg.lo(c), rg.hi(c)))
    }.toMap
    assert(duck.nonEmpty && duck.keySet == mine.keySet,
      s"row-group sets differ: duck=${duck.size} mine=${mine.size}")
    duck.foreach { case (k, v) =>
      assert(mine(k) == v, s"stat mismatch at $k: duck=$v mine=${mine(k)}")
    }
  }
}
