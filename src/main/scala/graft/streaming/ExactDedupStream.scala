package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EXACT content dedup with watermark-bounded state — the
  * streaming form of the batch `dedup_exact` gate (ref
  * `apps/etl/etl_slimpajama_dc_proc.py:133-139`, hard dedup on the
  * full-content hash key), built on
  * the engine's own `dropDuplicatesWithinWatermark` rather than a
  * hand-rolled state operator: the state store keeps ONE entry per
  * distinct content hash seen within the watermark horizon and the
  * engine evicts entries as event time passes them — bounded state
  * with no custom timeout bookkeeping, the built-in operator doing
  * exactly what MinHashStream's stateTtl note prescribes for the
  * approximate path.
  *
  * Semantics: a duplicate arriving within `delay` (event time) of the
  * first copy is dropped; after the watermark passes, the claim is
  * evicted and a late re-occurrence is treated as first-seen — the
  * standard bounded-memory dedup window trade, spec-pinned
  * (ExactDedupStreamSpec) including the eviction case. Keying on
  * md5(text) rather than the text keeps per-entry state O(1) no
  * matter the document size (the same reason the batch gate hashes).
  */
object ExactDedupStream {

  /** Survivor stream: first arrival per distinct `textCol` content
    * within the watermark window, in Append mode. `tsCol` must be a
    * TimestampType event-time column; `delay` is the watermark (e.g.
    * "10 minutes") — both the dedup horizon and the state bound.
    */
  def exactDedupStream(docs: DataFrame, textCol: String, tsCol: String,
                       delay: String): DataFrame =
    docs.withColumn("__content_key", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")
}
