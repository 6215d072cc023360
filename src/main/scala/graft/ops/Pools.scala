package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

import graft.functions.GraftFunctions._

/** Broadcast candidate-pool construction for the contrastive-training
  * operators (negative sampling, hard-negative mining — reference
  * training-pair flows, apps/training/sft.py's pair construction is
  * the API-surface anchor).
  *
  * The scale contract: these operators join every corpus row against a
  * small candidate pool, so the pool MUST be broadcastable. A 1/k
  * detHash sample of a 100 TB corpus is 100/k TB — the divisor that
  * was safe at prototype scale kills the job in the broadcast build at
  * production scale unless something checks. [[guardedBroadcast]] is
  * that check: it counts the pool once (the pool lineage is a cheap
  * scan+filter; the count costs far less than a doomed broadcast
  * build) and either broadcasts, falls back to an un-hinted shuffle
  * join, or fails fast with the divisor to fix.
  */
object Pools {

  private val log = LoggerFactory.getLogger(getClass)

  /** Rows above which a pool no longer broadcasts by default. Sized so
    * a pool of ~1 KB rows (a 256-dim float embedding + id) stays well
    * under Spark's 8 GB broadcast-table hard cap with margin for the
    * driver building it; override per call when rows are wider.
    */
  val DefaultMaxPoolRows = 4000000L

  /** Deterministic 1-in-poolDivisor sample of `df` by detHash of
    * `keyCol` — reproducible at any parallelism (detHash, never
    * rand(): rand's stream depends on partitioning). poolDivisor is
    * the knob you size at deploy time: pool rows ≈ |corpus| /
    * poolDivisor, and [[guardedBroadcast]] enforces the result.
    */
  def detHashPool(df: DataFrame, keyCol: String, poolDivisor: Long): DataFrame = {
    require(poolDivisor >= 1L, s"poolDivisor must be >= 1, got $poolDivisor")
    df.where(detHash(poolDivisor, col(keyCol)) === 0L)
  }

  /** Guard a pool destined for `broadcast()`: count it, then
    *  - fits (`<= maxPoolRows`): return the pool broadcast-hinted;
    *  - too big, `failFast=false`: log and return it un-hinted — the
    *    join degrades to a shuffle join (slower, but completes);
    *  - too big, `failFast=true`: throw with the measured size, so a
    *    mis-sized divisor dies in seconds, not in an executor OOM
    *    mid-broadcast.
    * The count is an eager action (the one place the library breaks
    * laziness); callers that persist the pool pay it once.
    */
  def guardedBroadcast(pool: DataFrame,
                       maxPoolRows: Long = DefaultMaxPoolRows,
                       failFast: Boolean = false): DataFrame = {
    val n = pool.count()
    if (n <= maxPoolRows) broadcast(pool)
    else if (failFast) throw new IllegalStateException(
      s"candidate pool has $n rows > maxPoolRows=$maxPoolRows; " +
        "raise poolDivisor (pool rows scale as |corpus|/poolDivisor) " +
        "or raise maxPoolRows if the cluster can broadcast it")
    else {
      log.warn(s"candidate pool has $n rows > maxPoolRows=$maxPoolRows; " +
        "falling back to a shuffle join (raise poolDivisor to restore " +
        "the broadcast plan)")
      pool
    }
  }
}
