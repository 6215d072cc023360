package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** The broadcast physical form of the native as-of join
  * (AsofBroadcastExec): semantics parity with the sort-merge exec and
  * the union-timeline form, the zero-shuffle/zero-sort plan contract
  * on the fact side, and cost-based physical selection through
  * `autoBroadcastJoinThreshold` (the same dial as BroadcastHashJoin).
  */
class AsofBroadcastSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L),
    (4L, "B", 100L), (5L, "C", 50L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    ("A", 90L, 10.0, "early"), ("A", 200L, 11.0, null),
    ("A", 300L, 12.0, "exact"), ("B", 400L, 99.0, "late")
  ).toDF("qsym", "qt", "px", "note")

  test("broadcast form gives identical answers to the merge form (seeded corpus)") {
    val left = spark.range(2000).select(
      (col("id") % 40).cast("string").as("k"),
      (abs(xxhash64(col("id"))) % 1000L).as("lt"),
      col("id").as("lid"))
    val right = spark.range(1200).select(
      (col("id") % 40).cast("string").as("rk"),
      (abs(xxhash64(col("id") + 7777)) % 1000L).as("rt"))
      .distinct()
      .withColumn("rv", (col("rt") * 3 + 1).cast("long"))

    for (tol <- Seq(None, Some(100L)); inner <- Seq(false, true)) {
      val merge = Relational.asofJoinNative(left, right, "k", "rk", "lt", "rt",
          Seq("rv"), toleranceUs = tol, inner = inner,
          broadcastRight = Some(false))
        .select("lid", "asof_time_us", "rv")
        .as[(Long, Option[Long], Option[Long])].collect().sorted
      val bcast = Relational.asofJoinNative(left, right, "k", "rk", "lt", "rt",
          Seq("rv"), toleranceUs = tol, inner = inner,
          broadcastRight = Some(true))
        .select("lid", "asof_time_us", "rv")
        .as[(Long, Option[Long], Option[Long])].collect().sorted
      assert(merge.sameElements(bcast), s"mismatch at tol=$tol inner=$inner")
    }
  }

  test("left side pays ZERO exchanges and ZERO sorts under broadcast") {
    val df = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
      "t", "qt", Seq("px", "note"), broadcastRight = Some(true))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofBroadcast"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert("\\bSort\\b".r.findAllIn(plan).isEmpty, plan)
    // and the answers are the documented as-of matches
    val out = df.select("trade_id", "asof_time_us", "px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, mt, px) => k -> ((mt, px)) }.toMap
    assert(out(1L) == (Some(90L), Some(10.0)))
    assert(out(2L) == (Some(200L), Some(11.0)))
    assert(out(3L) == (Some(300L), Some(12.0)))
    assert(out(4L) == (None, None))
    assert(out(5L) == (None, None))
  }

  test("left partitioning and order survive the broadcast join") {
    // the fact side is pre-bucketed and time-sorted; the join must not
    // disturb it — rows stay in their partition, in their order
    val sortedLeft = trades.repartition(2, col("sym"))
      .sortWithinPartitions(col("sym"), col("t"))
    val out = Relational.asofJoinNative(sortedLeft, quotes, "sym", "qsym",
      "t", "qt", Seq("px"), broadcastRight = Some(true))
    val perPartition = out.select("sym", "t").rdd
      .mapPartitions(it => Iterator.single(it.map(r =>
        (r.getString(0), r.getLong(1))).toList)).collect()
    assert(perPartition.length == 2)
    perPartition.foreach(p => assert(p == p.sorted, p.toString))
  }

  test("tolerance, inner, null keys/times behave exactly as the merge exec") {
    val l = Seq((1L, Option("A"), Option(100L)), (2L, None, Option(100L)),
      (3L, Option("A"), None)).toDF("lid", "k", "lt")
    val r = Seq((Option("A"), Option(50L), 7L), (None: Option[String], Option(40L), 8L),
      (Option("A"), None: Option[Long], 9L)).toDF("rk", "rt", "rv")
    val out = Relational.asofJoinNative(l, r, "k", "rk", "lt", "rt", Seq("rv"),
        broadcastRight = Some(true))
      .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(7L))
    assert(out(2L) == None)
    assert(out(3L) == None)

    val tol = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
        "t", "qt", Seq("px"), toleranceUs = Some(5L), inner = true,
        broadcastRight = Some(true))
      .select("trade_id").as[Long].collect().sorted
    assert(tol.sameElements(Array(2L, 3L)))
  }

  test("ties on (key, time): the last right row in scan order wins, both execs") {
    // two right rows at the same (key, time) with different values —
    // documented nondeterministic across retries, but both physical
    // forms must apply the same supersede rule within one run
    val l = Seq((1L, "A", 100L)).toDF("lid", "k", "lt")
    val r = Seq(("A", 50L, 1L), ("A", 50L, 2L)).toDF("rk", "rt", "rv")
      .coalesce(1) // single partition pins scan order
    val a = Relational.asofJoinNative(l, r, "k", "rk", "lt", "rt", Seq("rv"),
      broadcastRight = Some(false)).select("rv").as[Long].head()
    val b = Relational.asofJoinNative(l, r, "k", "rk", "lt", "rt", Seq("rv"),
      broadcastRight = Some(true)).select("rv").as[Long].head()
    assert(a == b, s"merge=$a broadcast=$b")
  }

  test("cost-based selection: small right broadcasts, threshold -1 forces merge") {
    val auto = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
      "t", "qt", Seq("px"))
    assert(auto.queryExecution.executedPlan.toString.contains("AsofBroadcast"),
      auto.queryExecution.executedPlan.toString)

    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val forced = Relational.asofJoinNative(trades, quotes, "sym", "qsym",
        "t", "qt", Seq("px"))
      val plan = forced.queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin") && !plan.contains("AsofBroadcast"), plan)
    }
  }

  test("empty right side: outer keeps all left rows nulled, inner drops all") {
    val empty = quotes.where(lit(false))
    val outer = Relational.asofJoinNative(trades, empty, "sym", "qsym",
      "t", "qt", Seq("px"), broadcastRight = Some(true))
    assert(outer.count() == 5 && outer.where(col("px").isNotNull).count() == 0)
    val inner = Relational.asofJoinNative(trades, empty, "sym", "qsym",
      "t", "qt", Seq("px"), inner = true, broadcastRight = Some(true))
    assert(inner.count() == 0)
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
