package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-bounded streaming dedup — the continuous twin of
  * [[graft.operators.Dedup.exact]] and the state-eviction complement of
  * the ingest-time index path ([[graft.engine.Engine]]'s
  * `appendRowsDeduped`).
  *
  * The ingest-time path keeps a PERSISTENT minhash index (bounded only
  * by corpus size) because near-dup recall must span the whole corpus.
  * Exact dedup of a live stream has a cheaper contract: a replayed /
  * double-delivered record arrives CLOSE IN EVENT TIME to its original
  * (at-least-once transports re-deliver within their retention window,
  * not months later), so the dedup state only needs to cover the
  * watermark horizon. Spark's `dropDuplicatesWithinWatermark` is exactly
  * that operator: per-key state lives until the watermark passes the
  * first-seen event time + delay, then is EVICTED — state size is
  * O(keys-per-horizon), not O(stream length), which is what makes exact
  * dedup runnable forever on an unbounded 100 TB/day stream. The price
  * is the documented re-emission window: a duplicate arriving after its
  * key's state was evicted is treated as new (the at-least-once →
  * effectively-once tradeoff every streaming engine documents).
  *
  * Key choice: dedup on a CONTENT hash (not the transport's record id)
  * catches producer-side replays too — `contentKey` builds the same
  * 64-bit xxhash the batch path uses, so batch backfill and live stream
  * agree on what "the same record" means.
  */
object StreamingDedup {

  /** 64-bit content key over the given columns (codegen'd xxhash64 —
    * same family the batch exact-dedup gate hashes with). */
  def contentKey(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** Drop exact duplicates from a stream, keeping per-key state only
    * within the watermark horizon. `events` may be a streaming OR batch
    * frame; batch takes the plain `dropDuplicates` plan (Spark rejects
    * the watermark variant on bounded input — and on bounded input the
    * horizon is the whole frame anyway, so the two agree whenever each
    * key's duplicates fall inside one horizon: the differential-testing
    * seam). One shuffle keyed by the dedup key in both modes. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String, delay: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, delay)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** [[dedupWithinWatermark]] keyed by content hash: adds a
    * `__graft_ck` column, dedups on it, drops it. */
  def dedupByContent(events: DataFrame, contentCols: Seq[String],
                     tsCol: String, delay: String): DataFrame =
    dedupWithinWatermark(
      events.withColumn("__graft_ck", contentKey(contentCols.map(col))),
      Seq("__graft_ck"), tsCol, delay)
      .drop("__graft_ck")
}
