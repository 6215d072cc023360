package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.GraftFunctions.{detHash, DetHashPrime}

/** Streaming weighted sample without replacement — the unbounded-
  * stream form of [[graft.ops.Relational.prioritySample]] (Efraimidis–
  * Spirakis priority keys on the deterministic detHash draw).
  *
  * Invariant that makes streaming possible at all: top-k by priority
  * key is a REDUCTION — the global sample is a function of any
  * partition of the stream's top-k candidate sets. So state is
  * `shards` independent candidate lists, each capped at k rows
  * (O(shards·k) total, corpus-size-independent), updated per
  * micro-batch by merge-sort-truncate, and ANY consumer recovers the
  * exact global sample by flattening the ≤ shards·k candidate rows
  * and taking the top k — the same argument that makes batch
  * TakeOrdered distributed. Priorities are computed by the SAME
  * column expressions as the batch operator (ln(u)/w on the detHash
  * uniform), so a streamed corpus and its batch replay select
  * IDENTICAL rows on a DEDUPED corpus — spec-asserted across batch
  * boundaries. Scope of the parity claim (ADVICE r8): the stream's
  * dedup-on-merge treats a re-arrival of the same (id, weight) as a
  * RE-DELIVERY and keeps one candidate (at-least-once idempotency),
  * while batch prioritySample ranks each physical duplicate row
  * separately (limit(k) can return one id twice). A corpus with true
  * duplicate rows therefore compares only after deduping ids on the
  * batch side — the streaming form's id-keyed semantics are the
  * at-least-once-safe ones.
  *
  * Sharding: the state key is detHash(id) mod shards, so hot ids
  * cannot skew one state partition and re-deliveries of the same id
  * land on the same shard (idempotent by the dedup-on-merge rule).
  */
object PrioritySampleStream {

  final case class Cand(id: Long, pk: Double)
  final case class ShardSample(shard: Int, cands: Seq[Cand])

  /** Per-shard current sample over a stream with `id` (long) and
    * `weight` (strictly positive double) columns. Run with
    * OutputMode.Update: each micro-batch re-emits only shards whose
    * candidate list changed. Global sample = flatten all shards'
    * cands, sort (pk desc, id desc), take k — see [[globalTopK]].
    */
  def prioritySampleStream(df: DataFrame, k: Int, shards: Int)
      : Dataset[ShardSample] = {
    require(k > 0 && shards > 0, s"need k>0, shards>0: $k, $shards")
    import df.sparkSession.implicits._
    val u = (detHash(DetHashPrime, col("id")) + lit(1L)).cast("double") /
      lit(DetHashPrime.toDouble + 1.0)
    val withPk = df.select(
      col("id").cast("long").as("_1"),
      (log(u) / col("weight")).as("_2"),
      pmod(detHash(DetHashPrime, col("id")), lit(shards.toLong))
        .cast("int").as("_3")).as[(Long, Double, Int)]
    withPk.groupByKey(_._3)
      .mapGroupsWithState[List[(Long, Double)], ShardSample](
        GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[(Long, Double, Int)], state) =>
          val cur = state.getOption.getOrElse(Nil)
          // re-delivered ids carry identical (id, pk) — distinct
          // keeps the merge idempotent
          val merged = (cur ++ it.map(r => (r._1, r._2))).distinct
            .sortBy { case (id, pk) => (-pk, -id) }
            .take(k)
          state.update(merged)
          ShardSample(shard, merged.map { case (id, pk) => Cand(id, pk) })
      }
  }

  /** Assemble the exact global sample from the shard candidates —
    * bounded input (≤ shards·k rows), so this runs anywhere, driver
    * included.
    */
  def globalTopK(shards: Seq[ShardSample], k: Int): Seq[Long] =
    shards.flatMap(_.cands)
      .sortBy(c => (-c.pk, -c.id))
      .take(k)
      .map(_.id)
}
