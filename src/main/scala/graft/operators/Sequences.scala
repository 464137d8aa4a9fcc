package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event-sequence analytics over an append event stream: funnel
  * reach, cohort retention, and first-order (Markov) transition counts.
  *
  * The reference engine's event pipelines end at windowed aggregation
  * (events_count.sql, http_events.sql); these are the sequence operators a
  * product-analytics / training-data curation deployment of the same engine
  * needs next (session-path mining, funnel conversion, cohort decay).
  *
  * Scale notes (100 TB): every operator here shuffles exactly once on the
  * entity key (`user_id`) and then aggregates; per-user state is bounded by
  * that user's event count, never by the corpus. No collects, no windows
  * without PARTITION BY, no cross joins.
  */
object Sequences {

  /** A funnel-relevant event: user, event-time, 0-based step index. */
  final case class StepEvent(u: Long, t: Long, i: Int)

  /** Per-user funnel progress: furthest step reached (0-based count) and
    * the event-time of the last matched step. */
  final case class FunnelState(reached: Int, last: Long)

  val initialFunnelState: FunnelState = FunnelState(0, Long.MinValue)

  /** The greedy funnel fold as plain Scala — the single kernel shared by
    * the batch column fold (whose spec differentials against this) and the
    * incremental streaming operator below. Events are sorted by (t, i)
    * before folding, so within-batch arrival order never matters. */
  def funnelAdvance(
      nSteps: Int, st: FunnelState, evs: Seq[StepEvent]): FunnelState =
    evs.sortBy(e => (e.t, e.i)).foldLeft(st) { (acc, e) =>
      if (acc.reached < nSteps && e.i == acc.reached && e.t > acc.last)
        FunnelState(acc.reached + 1, e.t)
      else acc
    }

  /** Incremental (streaming) funnel: per-user `FunnelState` maintained via
    * `mapGroupsWithState` — the micro-batch form of [[funnel]]'s fold.
    *
    * Equivalence contract: the final per-user `reached` equals the batch
    * fold whenever each user's event times are NONDECREASING ACROSS
    * micro-batch boundaries (the per-key ordered-log delivery a
    * key-partitioned Kafka topic provides); within a batch, order is
    * irrelevant (sorted before folding). Under arbitrary cross-batch
    * reordering no bounded state can reproduce the batch fold — a late
    * earlier-timestamped step can retroactively change which later events
    * matched. `StreamingFunnelSpec` proves the contract differentially.
    *
    * Output mode: Update; emitted `reached` is monotone per user, so the
    * latest (or max) row per user is the current funnel position.
    */
  def funnelStateful(
      events: org.apache.spark.sql.Dataset[StepEvent],
      nSteps: Int): org.apache.spark.sql.Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.groupByKey(_.u)
      .mapGroupsWithState[FunnelState, (Long, Int)](
        GroupStateTimeout.NoTimeout) {
        (u: Long, evs: Iterator[StepEvent], state: GroupState[FunnelState]) =>
          val st = funnelAdvance(nSteps,
            state.getOption.getOrElse(initialFunnelState), evs.toSeq)
          state.update(st)
          (u, st.reached)
      }
  }

  /** The (user, time, step-index) projection shared by [[funnel]] and
    * [[stepEvents]]: one place owns the step→index map and the relevance
    * filter, so the batch and streaming paths cannot drift on which events
    * they accept. Rejects duplicate step names up front (a repeated step
    * would be ambiguous in the map and only fail later with Spark's
    * opaque duplicate-map-key error). */
  private def stepProjection(
      events: DataFrame, steps: Seq[String],
      userCol: String, typeCol: String, timeCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps,
      "funnel steps must be distinct (a repeated step is ambiguous in the " +
        "type -> index map; model re-entry as a separate event type)")
    val idx = map(steps.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(i))
    }: _*)
    events
      .filter(col(typeCol).isin(steps.map(lit): _*) &&
        col(timeCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), col(timeCol).cast("long").as("t"),
        idx(col(typeCol)).as("i"))
  }

  /** Project an event frame to typed [[StepEvent]]s for [[funnelStateful]]
    * — the same projection as the batch [[funnel]], narrowed to the typed
    * encoding the state store needs. The stateful path requires NUMERIC
    * user ids and times (the case-class fields are primitive longs); rows
    * whose values don't cast are dropped here rather than crashing the
    * encoder mid-stream. */
  def stepEvents(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      timeCol: String = "ts"): org.apache.spark.sql.Dataset[StepEvent] = {
    import events.sparkSession.implicits._
    stepProjection(events, steps, userCol, typeCol, timeCol)
      .select(col("u").cast("long").as("u"), col("t"), col("i"))
      .filter(col("u").isNotNull && col("t").isNotNull)
      .as[StepEvent]
  }

  /** Funnel reach: for an ordered list of step names, count the users whose
    * event history contains the steps in order at strictly increasing
    * timestamps (the greedy earliest-match scan, equivalent to the classic
    * min-timestamp chaining formulation: taking the earliest match for step
    * k never hurts reachability of step k+1).
    *
    * One shuffle: irrelevant event types are filtered before the exchange
    * (the predicate reaches the parquet scan), the per-user fold runs as a
    * codegen'd higher-order `aggregate` over the user's sorted step events.
    * Per-user memory is the user's matching-event count only.
    *
    * Output: (step BIGINT 1-based, step_name, users BIGINT) — users is the
    * count reaching AT LEAST that step.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      timeCol: String = "ts"): DataFrame = {
    // (user, ts, step index) for funnel-relevant events only
    val relevant = stepProjection(events, steps, userCol, typeCol, timeCol)

    // greedy fold over the user's events sorted by (t, i): advance to step
    // acc.reached when this event IS that step and is strictly later than
    // the previously matched step's timestamp
    val reached = relevant
      .groupBy(col("u"))
      .agg(sort_array(collect_list(struct(col("t"), col("i")))).as("evs"))
      .select(
        aggregate(
          col("evs"),
          struct(lit(0).as("r"), lit(Long.MinValue).as("last")),
          (acc, e) =>
            when(e("i") === acc("r") && e("t") > acc("last"),
              struct((acc("r") + 1).as("r"), e("t").as("last")))
              .otherwise(acc))("r").as("reached"))

    // tiny frame from here on: at most |steps|+1 distinct reach levels;
    // "users at step s" = Σ n over levels reached >= s (a |steps|-row
    // theta join, broadcast nested loop — fine at any corpus scale since
    // both sides are bounded by |steps|)
    val byLevel = reached.filter(col("reached") > 0)
      .groupBy(col("reached")).agg(count(lit(1)).as("n"))

    val names = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }
    val nameDf = events.sparkSession.createDataFrame(names)
      .toDF("step", "step_name")
    nameDf.join(byLevel, byLevel("reached") >= nameDf("step"), "left")
      .groupBy(col("step"), col("step_name"))
      .agg(coalesce(sum(col("n")), lit(0L)).cast("long").as("users"))
      .select(col("step").cast("long").as("step"), col("step_name"),
        col("users"))
      .orderBy("step")
  }

  /** Epoch-nano → epoch-day with FLOOR semantics (a calendar CAST-to-DATE):
    * integer `div`/double division both fail here — `div` truncates toward
    * zero (folding the last pre-epoch day into day 0) and epoch-nano
    * magnitudes exceed 2^53, where a double quotient rounds. DECIMAL
    * division is exact at any long magnitude and `floor` gives the
    * calendar behavior. Pure Column API — no SQL-string splicing, so
    * backtick-needing or nested column names resolve like everywhere
    * else. */
  private def epochDay(time: Column): Column = {
    // pmod is always non-negative, so subtracting it floors t to the day
    // boundary in exact LONG arithmetic; the remaining division is of an
    // exact multiple, whose integer-valued DECIMAL quotient is exact (a
    // raw decimal quotient of t itself would HALF_UP-round at scale 6 and
    // misplace timestamps within 43 µs of midnight; a double quotient
    // rounds above 2^53)
    val d = 86400000000000L
    val t = time.cast("long")
    ((t - pmod(t, lit(d))).cast("decimal(38,0)") / lit(d)).cast("long")
  }

  /** (user, epoch-day) projection shared by the day-granular operators. */
  private def userDays(
      events: DataFrame, userCol: String, timeCol: String): DataFrame =
    events
      .filter(col(timeCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), epochDay(col(timeCol)).as("day"))

  /** Weekly cohort retention: users cohorted by their first active day,
    * counted once per (cohort day, week offset) they were active in.
    * Day numbers are integer days since the epoch — no timezone or
    * week-anchor semantics to disagree on across engines.
    *
    * Two shuffles, both on `user_id` (cohort min + the join back are
    * co-partitioned; AQE coalesces), then one on the tiny output key.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String = "user_id",
      timeCol: String = "ts"): DataFrame = {
    val days = userDays(events, userCol, timeCol)
    val cohort = days.groupBy(col("u")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "u")
      .select(col("u"), col("cohort_day"),
        ((col("day") - col("cohort_day")) / 7).cast("long").as("offset_week"))
      .distinct()
      .groupBy(col("cohort_day"), col("offset_week"))
      .agg(count(lit(1)).cast("long").as("users"))
      .orderBy("cohort_day", "offset_week")
  }

  /** Gaps-and-islands sessionization: the windowed formulation of session
    * assignment — lag() per user flags a gap > `gapNanos`, the running sum
    * of flags numbers the sessions, one aggregate per (user, session).
    * This is the composable dual of Spark's `session_window` aggregate
    * (same per-user partitioning, but the session ID is a first-class
    * column usable by downstream joins, not a window struct).
    *
    * Two shuffles, both on the user key (the lag window and the final
    * aggregate are co-partitioned — Catalyst reuses the exchange).
    * Deterministic: ordering ties break on the unique `idCol`.
    *
    * @return (user, session_id 1-based per user, start, end, n_events)
    */
  def sessionize(
      events: DataFrame,
      gapNanos: Long,
      userCol: String = "user_id",
      timeCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    eventSessions(events, gapNanos, userCol, timeCol, idCol)
      .groupBy(col(userCol).as("u"), col("session_id"))
      .agg(min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).cast("long").as("n_events"))
      .orderBy("u", "session_id")

  /** The per-event half of [[sessionize]]: every surviving event row plus
    * its 1-based `session_id` — the join-ready form session-scoped
    * analytics (e.g. [[Queries.sessionFunnel the session funnel gate]])
    * build on. */
  def eventSessions(
      events: DataFrame,
      gapNanos: Long,
      userCol: String = "user_id",
      timeCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(gapNanos > 0, "gap must be positive")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(idCol))
    events
      .filter(col(timeCol).isNotNull && col(userCol).isNotNull)
      .withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(timeCol) - col("__prev") > gapNanos, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Rolling 7-day active users (sliding-window COUNT DISTINCT — the
    * aggregate classic engines get wrong or quadratic): each distinct
    * (user, day) membership is expanded row-locally to the ≤`windowDays`
    * window-end days it supports, then one count-distinct per window end,
    * reported for observed days only.
    *
    * Scale shape: dedup shuffle on (user, day), then the count-distinct
    * shuffle on day — the expansion multiplies rows by at most
    * `windowDays` BEFORE the second exchange but after the first, so
    * shuffle volume is bounded by windowDays × |user-day memberships|,
    * never corpus × corpus (the naive day-range self-join). No window
    * function without PARTITION BY, no driver loop.
    *
    * @return (day, active_users) for every day with ≥1 event
    */
  def rollingActiveUsers(
      events: DataFrame,
      userCol: String = "user_id",
      timeCol: String = "ts",
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val days = userDays(events, userCol, timeCol).distinct()
    val expanded = days.select(col("u"),
      explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
        .as("d"))
    val observed = days.select(col("day").as("d")).distinct()
    expanded.groupBy(col("d"))
      .agg(countDistinct(col("u")).cast("long").as("active_users"))
      .join(observed, "d")
      .select(col("d").cast("long").as("day"), col("active_users"))
      .orderBy("day")
  }

  /** RFM segmentation (recency / frequency / monetary quintiles — the
    * classic user-value taxonomy): one per-user aggregate, then each
    * dimension's quintile via [[Ranks.globalRowNumber]] +
    * [[Ranks.ntileFromRank]] — exact `ntile` semantics WITHOUT the
    * one-task `ntile() OVER (ORDER BY …)` window, so the user dimension
    * can be billions of rows. Descending dimensions rank on the negated
    * metric; ties break on user id, so segments are engine-deterministic.
    *
    * @return (user, recency_day, freq, monet, r_seg, f_seg, m_seg,
    *         segment "RFM" digit string), one row per user
    */
  def rfmSegments(
      events: DataFrame,
      userCol: String = "user_id",
      timeCol: String = "ts",
      valueCol: String = "value",
      tiles: Int = 5): DataFrame =
    rfmSegmentsWithCleanup(events, userCol, timeCol, valueCol, tiles)._1

  /** [[rfmSegments]] plus the unpersist handle for the per-user cache it
    * pins (the [[Dedup.incrementalNearDups]] convention): call the handle
    * after the result is consumed, or the cached frame lives for the
    * session. */
  def rfmSegmentsWithCleanup(
      events: DataFrame,
      userCol: String = "user_id",
      timeCol: String = "ts",
      valueCol: String = "value",
      tiles: Int = 5): (DataFrame, () => Unit) = {
    val perUser = events
      .filter(col(timeCol).isNotNull && col(userCol).isNotNull)
      .groupBy(col(userCol).as("u"))
      .agg(
        max(epochDay(col(timeCol))).as("recency_day"),
        count(lit(1)).cast("long").as("freq"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("monet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the three negated ranking metrics, spelled once so the boundary
    // probe and the per-dimension rank calls agree exactly. A user whose
    // events all carry a null value has a null monet sum; ranking the raw
    // column would crown them top tile in Spark (ascending nulls-first on
    // the negated metric) while DuckDB's `ORDER BY monet DESC` defaults
    // to NULLS LAST → tile divergence. Pin them to the LOWEST-spender
    // tile on both engines with a -inf sentinel: negated it ranks after
    // every real sum, matching the oracle's nulls-last placement (the
    // emitted monet stays null).
    val negMetrics = Seq(
      "r_seg" -> -col("recency_day"),
      "f_seg" -> -col("freq"),
      "m_seg" -> -coalesce(col("monet"), lit(Double.NegativeInfinity)))
    val negged = perUser.select(
      col("u") +: negMetrics.map { case (o, m) => m.as(s"__neg_$o") }: _*)
    // ONE probe job over the persisted per-user frame yields the bucket
    // boundaries of all three dimensions AND the exact user count
    // (previously: three per-call approxQuantile jobs plus a count job)
    val (negBounds, nUsers) =
      Ranks.rangeProbe(negged, negMetrics.map(o => s"__neg_${o._1}"))
    def seg(out: String): DataFrame =
      Ranks.globalRowNumber(
        negged.select(col("u"), col(s"__neg_$out")), s"__neg_$out", "u",
        outCol = "__graft_rk", bounds = Some(negBounds(s"__neg_$out")))
        .select(col("u"),
          Ranks.ntileFromRank(col("__graft_rk"), lit(nUsers), tiles).as(out))
    val segged = Seq(seg("r_seg"), seg("f_seg"), seg("m_seg"))
      .foldLeft(perUser)(_.join(_, "u"))
    val out = segged
      .withColumn("segment",
        concat(col("r_seg").cast("string"), col("f_seg").cast("string"),
          col("m_seg").cast("string")))
      .orderBy("u")
    (out, () => { perUser.unpersist(); () })
  }

  /** First-order transition matrix: counts and row-normalized probabilities
    * of `event_type -> next event_type` per user, ordered by (ts, id) with
    * the id as a deterministic tie-break. Probability is emitted as
    * floor(p * 1e6) — an integer derived from one IEEE double division of
    * two exact longs, bit-identical across engines.
    *
    * One shuffle for the lead() window (partition by user), one for the
    * transition-count aggregation; the per-`from` totals ride a window over
    * the already-small count frame instead of a self-join.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      timeCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(timeCol), col(idCol))
    val pairs = events
      // null users must be excluded, not chained: they are unrelated
      // anonymous events, and as one lag partition they would both
      // fabricate transitions nobody made and form a corpus-sized window
      // partition at scale
      .filter(col(typeCol).isNotNull && col(timeCol).isNotNull &&
        col(userCol).isNotNull)
      .select(col(userCol), col(typeCol).as("cur"),
        lead(col(typeCol), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
    val counts = pairs.groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val total = Window.partitionBy(col("cur"))
    counts
      .select(col("cur"), col("nxt"), col("cnt").cast("long").as("cnt"),
        floor(col("cnt").cast("double") * lit(1000000.0) /
          sum(col("cnt")).over(total).cast("double")).cast("long")
          .as("p_micro"))
      .orderBy("cur", "nxt")
  }

  /** Frequent co-occurrence pairs with lift (the level-2 Apriori /
    * market-basket table, Agrawal VLDB'94): which item pairs appear in
    * the same basket more than independence predicts. Baskets build in
    * one basket-keyed aggregate (`collect_set` — bounded by the ITEM
    * vocabulary, never by basket event count); pairs generate
    * ROW-LOCALLY from each basket's sorted distinct array (≤ |items|²/2
    * per row, no basket self-join), then one pair-keyed count with
    * map-side combine — pair space is vocabulary², independent of
    * corpus size. Lift is all-integer:
    * `lift_micro = support·n_baskets·1e6 div (c_a·c_b)` — > 1e6 means
    * positively associated.
    *
    * @return (item_a, item_b, support, lift_micro), item_a < item_b,
    *         support ≥ minSupport */
  def frequentPairs(events: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long = 1L): DataFrame = {
    val baskets = events
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol).as("basket"))
      .agg(sort_array(collect_set(col(itemCol))).as("items"))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(items, (x, i) ->
        |  transform(slice(items, i + 2, size(items)),
        |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val itemCounts = baskets
      .select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("c"))
    val nb = baskets.agg(count(lit(1)).as("nb"))
    pairs
      .join(itemCounts.select(col("item").as("item_a"), col("c").as("ca")),
        Seq("item_a"))
      .join(itemCounts.select(col("item").as("item_b"), col("c").as("cb")),
        Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("support"),
        expr("CAST(support * nb * 1000000 DIV (ca * cb) AS BIGINT)")
          .as("lift_micro"))
  }
}
