package graft

import org.apache.spark.sql.functions._

/** Dev tool (SCALING.md measurements only): stage-level timing of the
  * repeat-co-purchase graph family at scaled shapes — separates the
  * shared edge-building cost (lineitem → per-order part sets → pair
  * stream → repeat filter) from the iterative operator on top, so a
  * "label-prop is slow" reading can be attributed to the right stage.
  * Not part of the library surface.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfgraph100")
    val spark = LocalSession.build("32")
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    timed("lineitem count")(println("  rows=" + li.count()))

    val pairs = li.groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> transform(filter(ps, y -> y > x)," +
          " y -> struct(x AS src, y AS dst))))")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      // v1: current production form — collect_set + lambda explode +
      // straight groupBy (map-side partial agg on ~near-unique keys)
      "v1_collect_set_groupBy" ->
        pairs.groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("__n")).where(col("__n") >= 2)
          .select(col("src"), col("dst")),
      // v2: same pair stream, but raw repartition THEN aggregate —
      // skips the map-side hash table that can't combine near-unique
      // keys (partial+final fuse into one post-exchange aggregate)
      "v2_collect_set_repart_agg" ->
        pairs.repartition(col("src"), col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("__n")).where(col("__n") >= 2)
          .select(col("src"), col("dst")),
      // v3: distinct self-join pair stream (no collect_set arrays,
      // exchange reused across both join sides) + straight groupBy
      "v3_selfjoin_groupBy" -> {
        val d = li.distinct()
        val p = d.as("a").join(d.as("b"), expr("a.ok = b.ok AND a.pk < b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        p.groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("__n")).where(col("__n") >= 2)
          .select(col("src"), col("dst"))
      },
      // v4: self-join + repartition-then-aggregate
      "v4_selfjoin_repart_agg" -> {
        val d = li.distinct()
        val p = d.as("a").join(d.as("b"), expr("a.ok = b.ok AND a.pk < b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        p.repartition(col("src"), col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("__n")).where(col("__n") >= 2)
          .select(col("src"), col("dst"))
      })

    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    // dev-only variant filter (comma-separated names) for isolated A/Bs
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)

    // triangleCount NORMALIZATION A/B (TODO r12): feed the raw
    // near-unique pair stream through the und-dedup stage exactly as
    // triangleCount spells it — straight .distinct() (map-side
    // partial agg over near-unique keys) vs raw-repartition-then-
    // distinct (the repeatCoPurchaseEdges lesson). Duplication factor
    // here is ~1-2 per key: the regime where the combine buys ~nothing.
    val normVariants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "t1_norm_distinct" ->
        pairs.select(
            least(col("src"), col("dst")).cast("long").as("__u"),
            greatest(col("src"), col("dst")).cast("long").as("__v"))
          .where(col("__u") =!= col("__v")).distinct(),
      "t2_norm_repart_distinct" ->
        pairs.select(
            least(col("src"), col("dst")).cast("long").as("__u"),
            greatest(col("src"), col("dst")).cast("long").as("__v"))
          .where(col("__u") =!= col("__v"))
          .repartition(col("__u"), col("__v")).distinct())

    for ((name, df) <- variants ++ normVariants; r <- 1 to runs
         if only.forall(_.contains(name)))
      timed(s"$name run$r")(
        df.write.format("noop").mode("overwrite").save())

    if (only.isEmpty) {
      val edges = variants.head._2
      timed("repeat edges count")(println("  edges=" + edges.count()))
      val lpa = timed("labelPropagation(4) on top")(
        graft.ops.Graph.labelPropagation(edges, "src", "dst", 4))
      timed("lpa row count")(println("  nodes=" + lpa.count()))
      lpa.unpersist()
    }
    spark.stop()
  }
}
