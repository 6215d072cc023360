package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics beyond connected components. The round
  * discipline is the same as [[Similarity.connectedComponents]]:
  * per-round RDD-rooting truncates the logical plan (an iterative
  * self-referencing plan otherwise grows until analysis hangs), and
  * superseded rounds unpersist so peak storage is 2×|nodes|.
  */
object Graph {

  /** PageRank in FIXED-POINT integer arithmetic — every rank is a
    * BIGINT in `unit`-ths (default 10⁻¹² units), every step is
    * integer multiply / truncating `div`, so the result is
    * bit-identical on any engine, any partitioning, any cluster size.
    * Floating-point PageRank cannot give that contract: the per-node
    * Σ of neighbor contributions is a partition-order-dependent
    * double sum, and cross-engine `0.85 * x` rounding differs from
    * `(x * 85) / 100`. Truncation loses ≤ 1 unit-quantum per edge per
    * round — immaterial at 10⁻¹² resolution, and the determinism buys
    * an oracle-checkable (and incrementally-diffable) rank table.
    *
    *   r₀(v)   = unit                      (the "1.0 per node" form)
    *   rᵢ₊₁(v) = unit·(den−num)/den + (num · Σ_{u→v} rᵢ(u) div deg(u)) div den
    *
    * with num/den the damping rational (85/100 ≈ the classic 0.85).
    *
    * Scale shape per round: one equi-join of edges to (deg, rank) on
    * src, one hash aggregation on dst, one left join back to nodes —
    * all shuffles keyed on node ids, no driver collection, lineage
    * truncated per round. Edges and degrees are computed once and
    * persisted. Overflow bound: a node's incoming sum is < max-indeg
    * × unit (total mass is conserved up to truncation), so BIGINT
    * holds to ~9·10⁶ in-degree at the default unit; shrink `unit`
    * for denser hubs.
    *
    * `edges` is DIRECTED (src → dst); pass both directions for an
    * undirected graph. Parallel duplicate edges should be
    * de-duplicated by the caller (they'd count double). Dangling
    * nodes (no out-edges) appear as rank sinks only; their mass
    * truncates away rather than redistributing — the conventional
    * simplification, mirrored exactly by the oracle.
    *
    * Returns (node, rank) with rank in unit-ths, one row per node
    * that appears as src or dst. The returned frame is persisted;
    * the caller owns `.unpersist()`.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingNum: Long = 85, dampingDen: Long = 100,
               unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampingNum > 0 && dampingNum < dampingDen,
      s"damping must be a proper fraction: $dampingNum/$dampingDen")
    val spark = edges.sparkSession
    def materialize(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)

    val e = materialize(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")))
    val deg = materialize(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nodes = materialize(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct())
    val base = (unit * (dampingDen - dampingNum)) / dampingDen

    var r = materialize(nodes.withColumn("r", lit(unit)))
    r.count()
    for (_ <- 1 to iters) {
      val contrib = e.join(deg, "src")
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
      val sums = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = materialize(nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"(coalesce(s, 0L) * ${dampingNum}L) div ${dampingDen}L")
          ).as("r")))
      next.count()
      r.unpersist()
      r = next
    }
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    r
  }

  /** Exact global triangle count of an undirected simple graph — the
    * standard cohesion metric (spam/link-farm detection, community
    * density). Input edges may be directed/duplicated; they are
    * normalized (u < v) and de-duplicated first.
    *
    * Shape matters at scale: the naive three-way edge self-join
    * generates every PATH of length 2 — a single degree-10⁶ hub makes
    * 10¹² wedges. This is the degree-ORIENTED form (Cohen's
    * MapReduce-classic): each edge points from its (degree, id)-lower
    * endpoint to the higher, making the graph a DAG where every
    * node's out-degree is O(√m) — so wedges (out-out pairs) total
    * O(m^1.5) WORST case regardless of hub skew, the provably optimal
    * join-based bound. Each triangle then has EXACTLY one wedge
    * (at its orientation-middle node) closed by one oriented edge —
    * counted once via a semi-join, no post-dedup. Three hash
    * shuffles (degree agg, wedge join, closing semi-join), no
    * driver state.
    *
    * Returns a 1-row frame (n_triangles BIGINT). Triangle count is
    * orientation-invariant, so an oracle may use the simpler id-only
    * ordering and must agree.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("__u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("__v"))
      .where(col("__u") =!= col("__v")).distinct()
    val deg = und.select(col("__u").as("__n"))
      .union(und.select(col("__v")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    val withDeg = und
      .join(deg.select(col("__n").as("__u"), col("__d").as("__du")), "__u")
      .join(deg.select(col("__n").as("__v"), col("__d").as("__dv")), "__v")
    val lowFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("__u") < col("__v"))
    val oriented = withDeg.select(
        when(lowFirst, col("__u")).otherwise(col("__v")).as("s"),
        when(lowFirst, col("__v")).otherwise(col("__u")).as("t"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.t") === col("e2.s"))
      .select(col("e1.s").as("a"), col("e2.t").as("c"))
    wedges.join(oriented.as("e3"),
        col("a") === col("e3.s") && col("c") === col("e3.t"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
