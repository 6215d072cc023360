package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** The native sort-merge as-of join (AsofJoinPlan → AsofJoinStrategy →
  * AsofJoinExec): semantics parity with the union-timeline form, edge
  * cases the merge pass must get right, and the physical-plan shape
  * (the exec is present; EnsureRequirements elides the sort for
  * pre-sorted input).
  */
class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L),
    (4L, "B", 100L), (5L, "C", 50L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    ("A", 90L, 10.0, "early"), ("A", 200L, 11.0, null),
    ("A", 300L, 12.0, "exact"), ("B", 400L, 99.0, "late")
  ).toDF("qsym", "qt", "px", "note")

  private def collectMap(df: DataFrame) =
    df.select("trade_id", "asof_time_us", "px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap

  test("native exec picks the latest right row at-or-before each left time") {
    val out = collectMap(Relational.asofJoinNative(
      trades, quotes, "sym", "qsym", "t", "qt", Seq("px", "note"), broadcastRight = Some(false)))
    assert(out(1L) == (Some(90L), Some(10.0)))
    assert(out(2L) == (Some(200L), Some(11.0)))
    assert(out(3L) == (Some(300L), Some(12.0))) // equality matches (<=)
    assert(out(4L) == (None, None))             // B's only quote is later
    assert(out(5L) == (None, None))             // C has no quotes at all
  }

  test("matched ROW is carried as a unit — null right value not backfilled") {
    val out = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
        "t", "qt", Seq("px", "note"), broadcastRight = Some(false))
      .where(col("trade_id") === 2L)
      .select("px", "note").as[(Option[Double], Option[String])].head()
    assert(out == (Some(11.0), None))
  }

  test("tolerance nulls stale matches; inner drops them; boundary is inclusive") {
    // trade 2 (t=205) matches qt=200 → staleness 5
    val tolOk = collectMap(Relational.asofJoinNative(trades, quotes,
      "sym", "qsym", "t", "qt", Seq("px", "note"), toleranceUs = Some(5L), broadcastRight = Some(false)))
    assert(tolOk(2L) == (Some(200L), Some(11.0))) // staleness == tol: fresh
    assert(tolOk(1L) == (None, None))             // staleness 10 > 5: nulled

    val inner = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
        "t", "qt", Seq("px", "note"), toleranceUs = Some(5L), inner = true, broadcastRight = Some(false))
      .select("trade_id").as[Long].collect().sorted
    assert(inner.sameElements(Array(2L, 3L))) // 3 matches exactly (staleness 0)
  }

  test("parity with the union-timeline form on a seeded random corpus") {
    // 40 keys × ~50 left rows, ~30 right rows each; right unique per
    // (key, time) by construction (distinct before use)
    val left = spark.range(2000).select(
      (col("id") % 40).cast("string").as("k"),
      (detHashLong(col("id")) % 1000L).as("lt"),
      col("id").as("lid"))
    val right = spark.range(1200).select(
      (col("id") % 40).cast("string").as("rk"),
      (detHashLong(col("id") + 7777) % 1000L).as("rt"))
      .distinct()
      .withColumn("rv", (col("rt") * 3 + 1).cast("long"))

    for (tol <- Seq(None, Some(100L)); inner <- Seq(false, true)) {
      val a = Relational.asofJoin(left, right, "k", "rk", "lt", "rt",
          Seq("rv"), toleranceUs = tol, inner = inner)
        .select("lid", "asof_time_us", "rv")
        .as[(Long, Option[Long], Option[Long])].collect().sorted
      val b = Relational.asofJoinNative(left, right, "k", "rk", "lt", "rt",
          Seq("rv"), toleranceUs = tol, inner = inner, broadcastRight = Some(false))
        .select("lid", "asof_time_us", "rv")
        .as[(Long, Option[Long], Option[Long])].collect().sorted
      assert(a.sameElements(b), s"mismatch at tol=$tol inner=$inner")
    }
  }

  test("null keys and null times never match (SQL equi-join semantics)") {
    val l = Seq((1L, Option("A"), Option(100L)), (2L, None, Option(100L)),
      (3L, Option("A"), None)).toDF("lid", "k", "lt")
    val r = Seq((Option("A"), Option(50L), 7L), (None: Option[String], Option(40L), 8L),
      (Option("A"), None: Option[Long], 9L)).toDF("rk", "rt", "rv")
    val out = Relational.asofJoinNative(l, r, "k", "rk", "lt", "rt", Seq("rv"), broadcastRight = Some(false))
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(7L))  // the null-key/null-time right rows are ignored
    assert(out(2L) == None)      // null left key
    assert(out(3L) == None)      // null left time
  }

  test("plan contains AsofJoinExec with one exchange+sort per side") {
    val df = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
      "t", "qt", Seq("px"), broadcastRight = Some(false))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("\\bSort\\b".r.findAllIn(plan).size == 2, plan)
  }

  test("EnsureRequirements elides the sort when input is already sorted") {
    // the bucketed-feature-table shape: repartition by key + sort by
    // (key, time) within partitions on the LEFT — its Sort disappears
    // from under the exec (the right still pays one)
    val sortedLeft = trades.repartition(col("sym"))
      .sortWithinPartitions(col("sym"), col("t"))
    val df = Relational.asofJoinNative(sortedLeft, quotes, "sym", "qsym",
      "t", "qt", Seq("px"), broadcastRight = Some(false))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    // 2 sorts total: the user's own sortWithinPartitions + the right
    // side's required sort. Without elision EnsureRequirements would
    // stack a THIRD sort on (sym, __lt) above the user's — the
    // required ordering is recognized as satisfied through the
    // __lt = t alias projection.
    assert("\\bSort\\b".r.findAllIn(plan).size == 2, plan)
    // and the result is still right
    val out = collectMap(df.withColumn("note", lit("")))
    assert(out(2L) == (Some(200L), Some(11.0)))
  }

  test("empty right side: outer keeps all left rows nulled, inner drops all") {
    val empty = quotes.where(lit(false))
    val outer = Relational.asofJoinNative(trades, empty, "sym", "qsym",
      "t", "qt", Seq("px"), broadcastRight = Some(false))
    assert(outer.count() == 5 && outer.where(col("px").isNotNull).count() == 0)
    val inner = Relational.asofJoinNative(trades, empty, "sym", "qsym",
      "t", "qt", Seq("px"), inner = true, broadcastRight = Some(false))
    assert(inner.count() == 0)
  }

  /** 63-bit deterministic pseudo-random from a long id (xxhash64 is
    * Spark-built-in and stable across runs/partitionings).
    */
  private def detHashLong(c: org.apache.spark.sql.Column) =
    abs(xxhash64(c))
}
