package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming semantic dedup — the single-pass form of
  * [[graft.ops.Similarity.semDedup]] and the stream seam of
  * [[graft.ops.Similarity.semDedupIncremental]]'s batch-vs-corpus
  * ingest: every arriving vector is assigned to its nearest centroid
  * (same rounded-6 cosine argmax, smallest-cid tie-break as the batch
  * assignCells) and compared against the cell's already-SEEN vectors;
  * it is removed iff any of them reaches `minCos`.
  *
  * Dominance semantics: "earlier-seen wins, even if itself removed" —
  * the arrival-order reading of semDedup's lower-id pair dominance.
  * Rows are processed in vec_id order WITHIN a micro-batch, so a
  * stream delivered in id order reproduces the batch operator's flags
  * exactly, under any micro-batch slicing (spec-pinned); across
  * batches, arrival order IS the dominance order, exactly like
  * semDedupIncremental's corpus-wins rule.
  *
  * State: per cell, the list of seen vectors (d doubles each), capped
  * at `maxState` — the cell-state analogue of the batch hot-cell
  * sub-blocking. Beyond the cap, new arrivals still compare against
  * the capped prefix but are no longer remembered: a later duplicate
  * of an uncached vector passes (recall loss on a hot cell — the
  * bounded-memory trade every capped dedup path in this repo takes;
  * MinHashStream documents the same contract). State is therefore
  * O(cells × maxState × d) regardless of stream length. For exact
  * unbounded dedup, compact instead: snapshot the seen set to a table
  * and seed a fresh stream through the batch semDedupIncremental.
  *
  * The centroid set is a DRIVER-side list — the same
  * bounded-model contract as kmeansFit's centroids and the PCA model:
  * d × k doubles riding the closure, never a shuffle.
  */
object SemDedupStream {

  final case class VecIn(vec_id: Long, emb: Seq[Double])
  final case class VecVerdict(vec_id: Long, cell: Int, removed: Int)

  private[streaming] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def norm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Nearest-centroid assignment, bit-matching the batch
    * assignCells rule: max rounded-6 cosine, ties to the smallest
    * cid.
    */
  private[streaming] def assign(v: Array[Double],
                                cents: Seq[(Int, Array[Double], Double)])
      : Int = {
    val nv = norm(v)
    var bestCid = Int.MaxValue
    var bestCos = Double.NegativeInfinity
    cents.foreach { case (cid, ce, cn) =>
      val c = round6(dot(v, ce) / (nv * cn))
      if (c > bestCos || (c == bestCos && cid < bestCid)) {
        bestCos = c; bestCid = cid
      }
    }
    bestCid
  }

  def semDedupStream(vecs: Dataset[VecIn],
                     centroids: Seq[(Int, Array[Double])],
                     minCos: Double,
                     maxState: Int = 4096): Dataset[VecVerdict] = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(maxState >= 1, s"maxState must be >= 1: $maxState")
    import vecs.sparkSession.implicits._
    val cents = centroids.map { case (cid, ce) => (cid, ce, norm(ce)) }
      .sortBy(_._1)
    val assigned = vecs.map { v =>
      val arr = v.emb.toArray
      (assign(arr, cents), v.vec_id, arr)
    }
    assigned.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Array[Double], Double)], VecVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cell: Int, it: Iterator[(Int, Long, Array[Double])], state) =>
          var seen = state.getOption.getOrElse(Nil)
          // newest-first accumulation: dominance only needs
          // existence, so order within the list is free; norms ride
          // the state so comparisons never recompute them
          val out = it.toSeq.sortBy(_._2).map { case (_, id, emb) =>
            val ne = norm(emb)
            val dup = seen.exists { case (s, sn) =>
              round6(dot(emb, s) / (ne * sn)) >= minCos
            }
            if (seen.size < maxState) seen = (emb, ne) :: seen
            VecVerdict(id, cell, if (dup) 1 else 0)
          }
          state.update(seen)
          out.iterator
      }
  }
}
