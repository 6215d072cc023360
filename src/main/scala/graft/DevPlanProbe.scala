package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev tool (r14): run a named probe frame with the noop sink and print
  * the FINAL adaptive physical plan (explain() before execution shows
  * isFinalPlan=false; the partition-dependent CPU defect under
  * investigation only appears in the post-AQE shape). Not part of the
  * library surface.
  */
object DevPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build("32")
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = Tables.load(spark, sfDir, "documents")
    val df = args.headOption.getOrElse("ppjoin") match {
      case "ppjoin" =>
        Similarity.jaccardPrefixPairs(d, "doc_id", "text", 0.9)
      case "postings" =>
        val tok = d.select(col("doc_id").as("__id"),
          explode(array_distinct(split(col("text"), " "))).as("__w"))
        val dfreq = tok.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
        val sz = tok.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
        val thr = 0.9
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__id")).orderBy(col("__df"), col("__w"))
        val pre = tok.join(dfreq, "__w").join(sz, "__id")
          .withColumn("__rn", row_number().over(wOrd))
          .where(col("__rn") <= col("__sz") -
            ceil(lit(thr) * col("__sz").cast("double")).cast("long") + 1)
        println(s"[probe] tok=${tok.count()} postings(pre)=${pre.count()} " +
          s"docs=${d.count()}")
        pre.groupBy(col("__w")).agg(count(lit(1)).as("k"))
          .agg(sum(col("k") * col("k")).as("sumk2"), max(col("k")).as("maxk"),
            count(lit(1)).as("nw")).show()
        val pre2 = pre.select(col("__w"), col("__id"), col("__sz"), col("__rn"))
          .localCheckpoint(true)
        val minOverlap = ceil(lit(thr / (1 + thr)) *
          (col("x.__sz") + col("y.__sz")).cast("double"))
        val rawPairs = pre2.as("x").join(pre2.as("y"),
          col("x.__w") === col("y.__w") && col("x.__id") < col("y.__id") &&
            col("y.__sz").cast("double") >= lit(thr) * col("x.__sz").cast("double") &&
            col("x.__sz").cast("double") >= lit(thr) * col("y.__sz").cast("double") &&
            (lit(1L) + least(col("x.__sz") - col("x.__rn"),
              col("y.__sz") - col("y.__rn"))).cast("double") >= minOverlap)
          .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
        println(s"[probe] rawPairs=${rawPairs.count()} " +
          s"distinctPairs=${rawPairs.distinct().count()}")
        pre.limit(1)
      case "repro" =>
        val base = spark.range(1000)
          .select((col("id") % 13).cast("string").as("__w"), col("id"))
          .localCheckpoint(true)
        val p = base.repartition(8, col("__w"))
        val j1 = p.as("x").join(p.as("y"),
          col("x.__w") === col("y.__w") && col("x.id") < col("y.id"))
        println("--- no hint ---"); j1.explain()
        val j2 = p.as("x").hint("merge").join(p.as("y").hint("merge"),
          col("x.__w") === col("y.__w") && col("x.id") < col("y.id"))
        println("--- merge hint ---"); j2.explain()
        j2.limit(1)
      case other => sys.error(s"unknown probe: $other")
    }
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
