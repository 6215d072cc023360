package graft

import org.apache.spark.sql.functions._

/** Dev tool (SCALING.md measurements only — the GraphProbe
  * discipline): convergence behavior of synchronous LPA on the
  * repeat-co-purchase graph. This probe produced the round-12
  * evidence behind labelPropagationConverged's period-≤2 contract:
  * on repeat≥2 at sf0.01/0.1 zero-change NEVER fires through round
  * 20 and distance-2 changes are still in the hundreds at round 12
  * (slow mixing), while on repeat≥3 the graph is period-2 from round
  * 4 with oscillators that flip forever (isolated co-purchase
  * pairs). Knobs: SPARK_GRAFT_SF_DIR, LPA_MIN_REPEAT.
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = LocalSession.build("32")
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val minRepeat = sys.env.getOrElse("LPA_MIN_REPEAT", "2").toInt
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
      .agg(count(lit(1)).as("n")).where(col("n") >= minRepeat)
      .select(col("src"), col("dst"))
    println(s"[lpaprobe] minRepeat=$minRepeat edges=${e.count()}")
    val t0 = System.nanoTime()
    val out = graft.ops.Graph.labelPropagationConverged(e, "src", "dst",
      maxIters = 20, checkEvery = 2)
    val mx = out.agg(max(col("rounds_run")), count(lit(1))).head()
    println(s"[lpaprobe] sf=$sfDir rounds_run=${mx.get(0)} nodes=${mx.get(1)} wall=${(System.nanoTime()-t0)/1e9}")
    // cross-check: labels equal fixed-round labelPropagation at maxIters
    val fixed = graft.ops.Graph.labelPropagation(e, "src", "dst", iters = 20)
    val diff = out.select(col("node"), col("community"))
      .join(fixed.withColumnRenamed("community", "c2"), "node")
      .where(col("community") =!= col("c2")).count()
    println(s"[lpaprobe] label mismatches vs fixed-20: $diff")
    // period-2 probe: when does l_r == l_{r-2} first hold? (step 2)
    var last: Option[org.apache.spark.sql.DataFrame] = None
    for (r <- Seq(2, 4, 6, 8, 10, 12)) {
      val lr = graft.ops.Graph.labelPropagation(e, "src", "dst", iters = r)
      last.foreach { p =>
        val d2 = lr.withColumnRenamed("community", "ca")
          .join(p.withColumnRenamed("community", "cb"), "node")
          .where(col("ca") =!= col("cb")).count()
        println(s"[lpaprobe] changes l_$r vs l_${r - 2}: $d2")
      }
      last = Some(lr)
    }
    spark.stop()
  }
}
