package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count — the stateful form of the batch
  * `kmv_distinct` aggregate (expressions/KmvDistinct.scala), the same
  * batch↔stream parity pairing as MinHashStream and
  * HeavyHittersStream.
  *
  * Shape: pre-hashed values (GraftFunctions.hash60 — the SAME hash
  * the batch sketch keys on) partition by hash residue into `groups`
  * disjoint substreams; each group's state is its k smallest DISTINCT
  * hashes plus a seen counter, updated per micro-batch by
  * flatMapGroupsWithState — O(groups × k) state forever. Because the
  * partition is BY the hash value, a group's k-minimum set is a
  * superset of the global k smallest hashes that land in that group,
  * so merging the groups' sets (union, sort, take k) reproduces the
  * global bottom-k EXACTLY — [[estimate]] over the union equals the
  * batch aggregate's answer on the same data, bit for bit (asserted
  * by KmvStreamSpec). That exact-merge property is what KMV buys over
  * HLL at a stream boundary: no register-layout coupling, just longs.
  *
  * Each batch a touched group re-emits its current sketch tagged with
  * `version` = rows processed by that group so far (monotone);
  * "current sketch" = max-version row per group, same read contract
  * as HeavyHittersStream.
  */
object KmvStream {

  final case class HashIn(h: Long)
  final case class SketchRow(grp: Int, version: Long, hashes: Seq[Long])

  /** Per-group state (public for the state-store encoder). */
  final case class GroupSketch(seen: Long, hashes: List[Long])

  /** 2^60 — hash60's domain, exact in double (see KmvDistinct). */
  private val M: Double = 1152921504606846976d

  def kmvStream(in: Dataset[HashIn], k: Int,
                groups: Int = 8): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    require(groups >= 1, s"groups must be >= 1: $groups")
    import in.sparkSession.implicits._
    in.groupByKey(x => math.floorMod(x.h, groups.toLong).toInt)
      .flatMapGroupsWithState[GroupSketch, SketchRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (grp: Int, rows: Iterator[HashIn], state) =>
          val prev = state.getOption.getOrElse(GroupSketch(0L, Nil))
          var n = prev.seen
          val set = mutable.TreeSet[Long](prev.hashes: _*)
          rows.foreach { r =>
            n += 1
            if (set.size < k) set.add(r.h)
            else if (r.h < set.last) {
              set.add(r.h)
              if (set.size > k) set.remove(set.last)
            }
          }
          val upd = GroupSketch(n, set.toList)
          state.update(upd)
          Iterator(SketchRow(grp, n, upd.hashes))
      }.toDF()
  }

  /** Global estimate from the union of per-group sketches — the
    * IDENTICAL estimator as KmvDistinct.eval: exact below k distinct,
    * else (k−1)·2^60 / h_(k).
    */
  def estimate(hashes: Seq[Long], k: Int): Long = {
    val bottom = hashes.distinct.sorted.take(k)
    if (bottom.size < k) bottom.size.toLong
    else math.floor((k - 1).toDouble * M / bottom.last.toDouble).toLong
  }
}
