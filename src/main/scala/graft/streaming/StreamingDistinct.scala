package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous distinct-count monitoring over a stream — the ingest-time
  * cardinality monitor of a training-data pipeline ("how many distinct
  * URLs / users / documents has this source produced so far / this
  * hour"), the streaming twin of the batch HLL rollup tables in
  * [[graft.operators.Sketches]].
  *
  * Design: plain streaming aggregations carrying Spark's DataSketches
  * HLL aggregate (`hll_sketch_agg`) — the state store keeps ONE sketch
  * buffer (≤ ~2^lgK registers) per group instead of a key per distinct
  * value, which is the thing that dies first at 100 TB (a streaming
  * `approx_count_distinct` state or an exact distinct's keyed state
  * grows with the value domain; HLL register state does not). Replay
  * contract (pinned by the spec): a given stream replays to identical
  * emissions (register merge is max-per-register, so micro-batch
  * retries are idempotent), estimates grow monotonically, and every
  * emission is inside the lgK error band of the exact distinct count —
  * but bit-equality with a one-shot batch sketch is NOT claimed:
  * DataSketches picks its estimator (HIP vs composite) by union
  * history, so union-built and direct-built sketches can differ by a
  * few counts within the band.
  *
  * Two shapes:
  *  - [[track]]: running per-group totals, update mode — state is
  *    groups × sketch bytes, never evicted (group cardinality is the
  *    only axis, same contract as [[StreamingHeavyHitters]]).
  *  - [[windowed]]: event-time tumbling windows under a watermark,
  *    append mode — closed windows EVICT, so state is
  *    windows-in-horizon × groups × sketch bytes, O(rate × horizon)
  *    like [[StreamJoin]]'s bound, and emitted rows are final (safe to
  *    sink to an append-only rollup table and query with
  *    [[graft.operators.Sketches.rollup]]).
  */
object StreamingDistinct {

  /** Running per-group distinct estimate (update mode). Emits
    * `(groupCols…, sketch, estimate)` per trigger; keep the sketch so a
    * consumer can keep rolling coarser without touching the stream. */
  def track(stream: DataFrame, groupCols: Seq[String], valueCol: String,
            lgK: Int = 12): DataFrame =
    graft.operators.Sketches.distinctSketch(stream, groupCols, valueCol, lgK)
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /** Event-time windowed distinct estimate with watermark eviction
    * (append mode): one FINAL row per (window, group) once the
    * watermark passes the window end — the shape to persist as a
    * standing rollup table. */
  def windowed(stream: DataFrame, tsCol: String, watermarkDelay: String,
               windowDuration: String, groupCols: Seq[String],
               valueCol: String, lgK: Int = 12): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration) +: groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .select((Seq(col("window.start").as("win_start"),
        col("window.end").as("win_end")) ++ groupCols.map(col) ++
        Seq(col("sketch"), hll_sketch_estimate(col("sketch"))
          .as("estimate"))): _*)
}
