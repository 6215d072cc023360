package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the registered queries
  * (all, or the names passed as args) so plan regressions — missing
  * filter pushdown, unexpected shuffles, lost broadcasts — are
  * reviewable. Not part of the library surface.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build("4")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted = args.toSet
    Queries.all
      .filter(q => wanted.isEmpty || wanted(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try q.fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
