package graft

import org.apache.spark.sql.SparkSession

/** One local-session builder for every dev entry point (Verify, Bench,
  * StressBench, Explain) so the tuning knobs cannot drift between the
  * tools whose numbers SCALING.md compares:
  *  - SPARK_GRAFT_CPUS threads (callers pass their default);
  *  - shuffle partitions sized to the thread count;
  *  - small-SF scan splitting (default openCost keeps a sub-MB
  *    parquet on ONE core through a whole expression pipeline);
  *  - UTC session timezone (timestamp oracles);
  *  - UI off.
  */
object LocalSession {
  def build(defaultCpus: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    // shuffle partitions default to the thread count (right for the
    // gate SFs), overridable for scaled-shape probes: at the ×300
    // graph shape 32 partitions put ~8M-row aggregation hash tables
    // in every task and the suite goes spill-bound — the same
    // data-to-partition sizing a real cluster does with
    // spark.sql.shuffle.partitions at 100 TB (SCALING.md round-11)
    val shuffleParts =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    SparkSession.builder()
      .master(s"local[$cpus]")
      // the full extension surface (native SQL functions, opt-in
      // optimizer rules, the as-of planner strategy) is part of what
      // Verify/Bench exercise — same wiring as SparkSpec's session
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
