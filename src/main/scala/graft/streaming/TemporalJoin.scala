package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time temporal enrichment join — the streaming "FOR SYSTEM_TIME
  * AS OF" shape: each event picks up the dimension VERSION in force at
  * its event time (currency rate at trade time, model config at request
  * time, user segment at impression time). Completes the streaming join
  * family next to [[StreamJoin]] (stream↔stream interval) and the
  * stream↔static equi-join.
  *
  * Spark-first decomposition, no custom state store: the unbounded
  * temporal condition (`version_ts ≤ event_ts`, latest wins) keeps
  * every version forever — unbounded state by definition — so the
  * operator takes the standard bounded-validity contract (a version is
  * stale after `validity`, the TTL every streaming SQL engine applies
  * here) and becomes two NATIVE stateful operators:
  *
  *  1. an interval join (`event_ts - validity ≤ version_ts ≤ event_ts`)
  *     — the engine derives state bounds from the interval arithmetic,
  *     so both buffers are O(rate × horizon);
  *  2. a per-event latest-version reduce: group by the EVENT (all its
  *     columns — they are functionally dependent on its identity, and
  *     grouping by them beats nondeterministic any_value plucking) and
  *     `max_by(values, (version_ts, tiebreak))`. The grouping carries
  *     the watermarked event-time column, so append mode emits each
  *     enriched event exactly when the watermark proves no later-but-
  *     still-≤-event_ts version can arrive — the event-buffering
  *     semantics a hand-rolled temporal join would need custom state
  *     for, derived here from watermark arithmetic alone.
  *
  * The same plan runs on BOUNDED frames unchanged (watermarks no-op,
  * the reduce is a plain aggregate) — TemporalJoinSpec's differential
  * seam: accumulated streaming output ≡ the batch run ≡ an
  * [[graft.operators.AsOfJoin]] whose matches fall inside `validity`.
  *
  * Late versions: one watermark delay covers BOTH sides (they gate each
  * other through the join); a version later than the delay is dropped
  * by the engine — the documented at-most-`delay` disorder contract,
  * identical to every other watermarked operator here.
  */
object TemporalJoin {

  /** CONTRACT — events are enriched per DISTINCT row: the reduce groups
    * by every event column, so two byte-identical event rows collapse
    * into one output row. Streams whose duplicate rows carry meaning
    * must include an identity column (an event id, an offset) — the
    * usual transport shape; a streaming-safe synthetic id does not
    * exist to invent here (monotonically_increasing_id is not
    * replay-stable, and inventing one would silently break the
    * crash-recovery determinism every other operator keeps).
    *
    * @param events     event stream; ALL its columns are preserved
    * @param versions   dim-version stream: keys ++ versionTs ++ valueCols
    * @param validity   max age of a version still considered in force
    *                   (the state-bounding TTL, e.g. "30 days")
    * @param tiebreak   orders versions sharing (key, version_ts);
    *                   highest wins (latest-write-wins convention)
    * @return events enriched with `valueCols` and `__version_ts` (the
    *         chosen version's timestamp); events with no in-validity
    *         version are DROPPED (inner semantics — the outer variant
    *         is a left_outer interval join away but chains two stateful
    *         operators differently, so it is deliberately not defaulted)
    */
  def enrich(events: DataFrame, versions: DataFrame, keys: Seq[String],
             eventTs: String, versionTs: String, valueCols: Seq[String],
             validity: String, watermarkDelay: String,
             tiebreak: Option[String] = None): DataFrame = {
    require(valueCols.nonEmpty, "enrich requires at least one value column")
    val vSide = versions.select(
      (keys.map(col) :+ col(versionTs) :+
        struct(valueCols.map(col): _*).as("__vv") :+
        tiebreak.map(col).getOrElse(lit(0L)).cast("long").as("__tb")): _*)
    val joined = StreamJoin.intervalJoin(
      events, vSide, keys, eventTs, versionTs,
      before = validity, after = "0 seconds", watermarkDelay)
    // latest version in force wins; ordering key (version_ts, tiebreak)
    // is total per the latest-write-wins convention
    val eventCols = events.columns.toSeq
    joined
      .groupBy(eventCols.map(col): _*)
      .agg(max_by(struct(col(versionTs).as("__ts"), col("__vv")),
        struct(col(versionTs), col("__tb"))).as("__pick"))
      .select((eventCols.map(col) :+
        col("__pick.__ts").as("__version_ts")) ++
        valueCols.map(v => col(s"__pick.__vv.`$v`").as(v)): _*)
  }
}
