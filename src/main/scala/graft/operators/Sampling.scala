package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Deterministic, hash-driven sampling and dataset-splitting operators —
  * the curation steps a training-data pipeline runs after dedup/quality
  * filtering (train/val/test carving, per-domain quotas, down-sampling).
  *
  * All randomness is [[CrossHash]] over a salted id, never `rand()`:
  *   - reproducible across runs, engines, and cluster sizes (the same row
  *     always lands in the same split — a requirement for train/test
  *     hygiene when the corpus is re-processed incrementally);
  *   - oracle-checkable bit-for-bit in DuckDB (the same md5 fold);
  *   - membership is a pure projection, so [[hashSample]]/[[hashSplit]]
  *     add ZERO shuffles — at 100 TB they run entirely map-side, and the
  *     filter sits directly on top of the parquet scan.
  *
  * Only [[quotaPerGroup]] shuffles (one hash-partition by group — the
  * minimum possible for a per-group top-k), using window `row_number`,
  * which TakeOrdered-style accumulates only `n` rows per group per
  * partition before the final per-group sort.
  */
object Sampling {

  /** Salted bucket in `[0, buckets)`: `hash56(salt ":" id) mod buckets`.
    * 56 uniform bits mod 1e4 has bias < 2^-42 — immaterial. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    pmod(CrossHash.hash56(concat(lit(salt + ":"), id.cast("string"))),
      lit(buckets.toLong))

  /** The same bucket in DuckDB SQL (for oracles), over id expression `e`. */
  def duckdbHashBucket(e: String, salt: String, buckets: Int): String =
    s"(${CrossHash.duckdbHash56(s"'$salt:' || CAST($e AS VARCHAR)")}) % $buckets"

  /** Deterministic Bernoulli sample: keep a row iff its salted hash bucket
    * falls below `fraction`. Map-side only — no shuffle, no RNG state; the
    * predicate pushes into the scan like any other filter. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String, buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(col(idCol), salt, buckets) <
      lit(math.round(fraction * buckets)))

  /** Distribution-matching sampler: draw ~`m` rows from `pool` so the
    * drawn set's composition over `bucketCol` matches `target`'s —
    * the "make the pretraining mix look like the target domain" step
    * (the bucket-exact cousin of the DSIR importance weights: DSIR
    * reweights continuously, this matches a discrete marginal exactly).
    * Per bucket b: quota = ⌊count_target(b)·m / N_target⌋, clamped to
    * what the pool holds (a clamped bucket under-delivers rather than
    * distorting its neighbors — callers can read the shortfall from the
    * output's per-bucket counts); drawn members are the quota smallest
    * by salted hash, so the draw is uniform-within-bucket, deterministic
    * and SQL-replayable.
    *
    * Scale shape: one bucket-count aggregate per frame (bucket
    * cardinality ≪ corpus; quotas broadcast), one
    * [[Ranks.groupedRowNumber]] over the pool (bucketed two-pass — pool
    * buckets are corpus-sized), one broadcast quota join. All integer.
    *
    * @return the pool rows drawn, with their `bucketCol` retained */
  def distributionMatchSample(pool: DataFrame, target: DataFrame,
                              idCol: String, bucketCol: String, m: Int,
                              salt: String): DataFrame = {
    require(m >= 0, "m must be >= 0")
    val quotas = target.groupBy(bucketCol)
      .agg(count(lit(1)).as("__graft_cb"))
      .crossJoin(broadcast(target.agg(count(lit(1)).as("__graft_nt"))))
      .select(col(bucketCol),
        expr(s"(__graft_cb * $m) div __graft_nt").as("__graft_q"))
    val hashed = pool.withColumn("__graft_h",
      CrossHash.hash56(concat(lit(s"$salt:"), col(idCol).cast("string"))))
    graft.operators.Ranks.groupedRowNumber(
      hashed, bucketCol, "__graft_h", idCol, outCol = "__graft_rk")
      .join(broadcast(quotas), bucketCol)
      .filter(col("__graft_rk") <= col("__graft_q"))
      .drop("__graft_h", "__graft_rk", "__graft_q")
  }

  /** Systematic sampling: every `k`-th row of the salted-hash order —
    * the equal-interval design that guarantees an EXACT ⌈n/k⌉ sample
    * size and even coverage of the (pseudorandom) order, where
    * [[hashSample]]'s Bernoulli draw only hits the rate in expectation.
    * The order is the bucketed global rank over [[CrossHash]] of the id
    * (no single-partition window); selection is `rank % k == 1`, all
    * integer, so the exact row set replays in SQL. Like
    * [[stratifiedSplit]], this is a frozen-snapshot design — ranks shift
    * when the corpus grows. Selection is `(rank−1) % k == 0` (ranks are
    * 1-based; k=1 keeps everything). */
  def systematicSample(df: DataFrame, idCol: String, k: Int,
                       salt: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hashed = df.withColumn("__graft_h",
      CrossHash.hash56(concat(lit(s"$salt:"), col(idCol).cast("string"))))
    graft.operators.Ranks.globalRowNumber(hashed, "__graft_h", idCol,
      outCol = "__graft_rk")
      .filter((col("__graft_rk") - 1) % k === 0)
      .drop("__graft_h", "__graft_rk")
  }

  /** Exact stratified split: within every stratum, rows are ordered by
    * salted [[CrossHash]] (pseudorandom but fully deterministic) and the
    * first ⌊p₁·n⌋ go to the first split, the next ⌊p₂·n⌋-ish to the
    * second, and so on — so each stratum's split sizes are EXACT
    * (±1 from flooring), where [[hashSplit]] only hits the proportions
    * in expectation. The price is a rank instead of a projection: the
    * per-stratum order comes from [[Ranks.groupedRowNumber]] (bucketed
    * two-pass — strata are corpus-fraction-sized, so a per-stratum
    * window would be the single-partition hazard renamed).
    *
    * `percents` are integer percentages summing to 100; membership is
    * the all-integer test `100·rank ≤ cumPct·n` (≡ rank ≤ ⌊cumPct·n/100⌋),
    * so the assignment replays exactly in SQL. Unlike [[hashSplit]],
    * assignments are NOT stable under corpus growth (ranks shift) — this
    * is the frozen-snapshot splitter; use [[hashSplit]] for incremental
    * ingest. */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
                      percents: Seq[(String, Int)], salt: String,
                      splitCol: String = "split"): DataFrame = {
    require(percents.nonEmpty && percents.map(_._2).sum == 100,
      "percents must sum to 100")
    val hashed = df.withColumn("__graft_h",
      CrossHash.hash56(concat(lit(s"$salt:"), col(idCol).cast("string"))))
    val ranked = graft.operators.Ranks.groupedRowNumber(
      hashed, stratumCol, "__graft_h", idCol, outCol = "__graft_rk")
    val totals = df.groupBy(stratumCol).agg(count(lit(1)).as("__graft_n"))
    val cum = percents.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val labeled = percents.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(percents.last._1): Column) { case ((name, hi), els) =>
        when(col("__graft_rk") * 100 <= lit(hi.toLong) * col("__graft_n"),
          lit(name)).otherwise(els)
      }
    ranked.join(totals, stratumCol)
      .withColumn(splitCol, labeled)
      .drop("__graft_h", "__graft_rk", "__graft_n")
  }

  /** Deterministic dataset split: label every row with the name of the
    * split whose cumulative-fraction interval contains its hash bucket
    * (e.g. `("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`). Fractions
    * must sum to ~1; the last split absorbs rounding. Pure projection —
    * rows never move, so re-running over a grown corpus preserves every
    * existing row's assignment (incremental-ingest hygiene). */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                salt: String, buckets: Int = 10000,
                splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions sum to $total, expected 1")
    val bucket = hashBucket(col(idCol), salt, buckets)
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * buckets) }.tail
    val labeled = splits.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(splits.last._1): Column) { case ((name, hi), els) =>
        when(bucket < lit(hi), lit(name)).otherwise(els)
      }
    df.withColumn(splitCol, labeled)
  }

  /** Domain-weighted mixture sampling: per-group keep rates (e.g.
    * `lang -> 0.9` for high-resource down-weighting), applied as a pure
    * projection — the rate map is a plan-time literal (mixture weight
    * tables are human-sized), the bucket test is the same salted hash as
    * [[hashSample]], so membership is reproducible and shuffle-free.
    * Groups absent from `rates` keep `defaultRate`. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    rates: Seq[(String, Double)], defaultRate: Double,
                    salt: String, buckets: Int = 10000): DataFrame = {
    val thresholds = rates.map { case (g, f) => g -> math.round(f * buckets) }
    val thr = coalesce(
      element_at(typedlit(thresholds.toMap), col(groupCol)),
      lit(math.round(defaultRate * buckets)))
    df.filter(hashBucket(col(idCol), salt, buckets) < thr)
  }

  /** Temperature (α) resampling — the multilingual/domain re-balancing
    * rule of mT5/XLM-R: sample group g with probability ∝ n_g^α, realized
    * as deterministic per-group keep rates r_g = (n_min/n_g)^(1−α)
    * (normalized so the SMALLEST group keeps everything; α=1 reduces to
    * natural proportions, α→0 to uniform). Unlike [[mixtureSample]] the
    * rate table is COMPUTED from the data — one tiny group-count
    * aggregate (map-side combinable; group cardinality is human-sized)
    * broadcast back onto the corpus — so membership stays a map-side
    * filter over the same salted hash bucket as [[hashSample]]: zero
    * corpus shuffles at any scale.
    *
    * Cross-engine determinism: the per-group threshold is
    * `round(round(pow(n_min/n_g, 1−α), 6) · buckets)` — the rate is
    * rounded to 6 decimals first so a ±1-ulp `pow` divergence between
    * engines cannot move the integer threshold (it would have to land
    * within 1e-10 of a .5 boundary of the 6-dp grid).
    *
    * @param alpha sampling temperature in (0, 1]; lower = flatter mix
    * @return input rows of the kept sample (groupCol first, then df's
    *         remaining columns)
    */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        alpha: Double, salt: String,
                        buckets: Int = 10000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val thr = counts.crossJoin(broadcast(nMin))
      .withColumn("__thr",
        round(round(pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1.0 - alpha)), 6) * buckets).cast("long"))
      .select(col(groupCol), col("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(hashBucket(col(idCol), salt, buckets) < col("__thr"))
      .drop("__thr")
  }

  /** Token-budget shard packing: assign each document a shard id such
    * that every shard holds ~`budget` tokens — the "concatenate the
    * token stream, cut every `budget` tokens" convention of pre-training
    * data packing (a document whose span straddles a cut belongs to the
    * shard its FIRST token lands in).
    *
    * Parallelism: documents are first split into `groups` independent
    * packing domains by salted id hash; each domain packs its own token
    * stream (ordered by salted hash, then id — deterministic). One
    * shuffle (hash-partition by domain); the running sum is a window
    * cumsum inside each domain. At 100 TB, `groups` scales with the
    * cluster (each domain's stream is corpus/groups tokens), and shard
    * ids are stable under re-runs because ordering is content-keyed, not
    * partition-keyed.
    *
    * @return input rows + (pack_group, shard, start_offset) where
    *         `shard` numbers budget-sized cuts within the group and
    *         `start_offset` is the document's first-token position in
    *         its group's stream.
    */
  def packShards(df: DataFrame, idCol: String, tokensCol: String,
                 budget: Long, groups: Int, salt: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val grp = hashBucket(col(idCol), salt, groups)
    val w = Window.partitionBy("pack_group")
      .orderBy(hashBucket(col(idCol), salt + ":ord", 1 << 30), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_group", grp)
      .withColumn("__cum", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("start_offset", col("__cum") - col(tokensCol).cast("long"))
      .withColumn("shard", floor(col("start_offset") / budget))
      .drop("__cum")
  }

  /** Per-group quota: keep at most `n` rows per group, chosen in salted-
    * hash order (a deterministic uniform draw without replacement). Ties
    * on the hash break by id, so the result is total-order stable. One
    * shuffle (hash-partition by group); skewed groups are bounded by the
    * per-partition top-n accumulation of window row_number. */
  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir" — public
    * literature): each row draws `u ∈ (0, 1]` from its salted hash and
    * ranks by `u^(1/w)` descending — equivalently by `ln(u)/w`
    * descending, which is the form used here; taking the top `k` yields
    * exactly the WRS-without-replacement distribution, with heavier rows
    * proportionally likelier. Hash-derived `u` makes the draw
    * reproducible across runs AND engines (the [[CrossHash]] trick), and
    * the priority converts to integer nano-units so rank comparisons
    * never hinge on a float ulp.
    *
    * Scale shape: one projection + one top-k (TakeOrdered via the rank
    * window on an already-tiny k) — rows never shuffle except the k
    * winners.
    *
    * @param weight strictly-positive weight column (e.g. token count)
    * @return (idCol, weight AS w, priority_nano, rn) the k winners
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int, salt: String): DataFrame = {
    val h = CrossHash.hash56(concat(lit(salt + ":"), col(idCol).cast("string")))
    // (h+1)/2^56 ∈ (0, 2^-56 .. 1]: exact BIGINT arithmetic, one double
    // division — identical rounding in the JVM and DuckDB
    val u = (h + lit(1L)).cast("double") / lit(72057594037927936.0)
    val pri = round(log(u) / weight.cast("double") * 1e9).cast("long")
    // w = 0 would yield ±Infinity priorities and w < 0 (e.g. Spark's
    // size(split(null,' ')) = -1 for null text) would flip the sign and
    // rank such rows FIRST — drop degenerate rows up front so the sample
    // matches any engine where log(u)/w is NULL-ish for them
    df.filter(weight.cast("double") > 0)
      .select(col(idCol), weight.cast("long").as("w"), pri.as("priority_nano"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("priority_nano").desc, col(idCol).asc)).cast("long"))
      .filter(col("rn") <= k)
  }

  def quotaPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                    n: Int, salt: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashBucket(col(idCol), salt, 1 << 30), col(idCol))
    df.withColumn("__graft_qrn", row_number().over(w))
      .filter(col("__graft_qrn") <= n)
      .drop("__graft_qrn")
  }

  /** Bounded max-heap of the k smallest `(bucket, id)` pairs — the
    * mergeable summary behind [[quotaPerGroupAgg]]. Array-backed binary
    * heap keyed lexicographically; O(log k) insert, O(k) merge. Mutable
    * within a partition (ObjectHashAggregate keeps typed-agg buffers
    * deserialized — same contract as [[HeavyHitters.MGBuffer]]). */
  final class BKBuf(val k: Int) extends Serializable {
    var size = 0
    val bs = new Array[Long](k)
    val ids = new Array[Long](k)
    @inline private def gt(b1: Long, i1: Long, b2: Long, i2: Long): Boolean =
      b1 > b2 || (b1 == b2 && i1 > i2)
    def insert(b: Long, id: Long): Unit =
      if (size < k) { // grow phase: push + sift up
        var c = size
        bs(c) = b; ids(c) = id; size += 1
        while (c > 0 && gt(bs(c), ids(c), bs((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (gt(bs(0), ids(0), b, id)) { // beats the current max: replace root
        bs(0) = b; ids(0) = id
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val r = l + 1
          var m = c
          if (l < size && gt(bs(l), ids(l), bs(m), ids(m))) m = l
          if (r < size && gt(bs(r), ids(r), bs(m), ids(m))) m = r
          if (m == c) done = true else { swap(c, m); c = m }
        }
      }
    @inline private def swap(a: Int, b: Int): Unit = {
      val tb = bs(a); bs(a) = bs(b); bs(b) = tb
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    /** Insert only if `(b, id)` is not already held — the AT-LEAST-ONCE
      * variant for streaming state ([[graft.streaming.StreamingSample]]),
      * where a replayed record must not occupy a second slot and evict a
      * legitimate member. O(k) membership scan; k is a constant. Batch
      * aggregation keeps the plain [[insert]] (each input row is one
      * logical row there, duplicates included by design). */
    def insertDistinct(b: Long, id: Long): Unit = {
      var i = 0
      while (i < size) {
        if (bs(i) == b && ids(i) == id) return
        i += 1
      }
      insert(b, id)
    }

    /** Current members, smallest (bucket, id) first. */
    def sortedMembers: Seq[(Long, Long)] =
      (0 until size).map(i => (bs(i), ids(i))).sorted
  }

  /** Typed bottom-k aggregator over `(bucket, id)` rows: keeps the k
    * lexicographically-smallest pairs, emits their ids ascending. */
  final class BottomK(k: Int)
    extends Aggregator[(Long, Long), BKBuf, Array[Long]] {
    require(k > 0, "k must be positive")
    override def zero: BKBuf = new BKBuf(k)
    override def reduce(buf: BKBuf, in: (Long, Long)): BKBuf = {
      buf.insert(in._1, in._2); buf
    }
    override def merge(a: BKBuf, b: BKBuf): BKBuf = {
      var i = 0
      while (i < b.size) { a.insert(b.bs(i), b.ids(i)); i += 1 }
      a
    }
    override def finish(buf: BKBuf): Array[Long] =
      (0 until buf.size).map(i => (buf.bs(i), buf.ids(i)))
        .sorted.map(_._2).toArray
    override def bufferEncoder: Encoder[BKBuf] = Encoders.kryo[BKBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** [[quotaPerGroup]]'s rows (k smallest `(salted-bucket, id)` per
    * group) through a bounded-heap typed aggregator instead of a window
    * sort. The window plan hash-partitions by group and then SORTS every
    * group's FULL row set inside the exchange before `row_number` can
    * cut at n; this plan is an ObjectHashAggregate pair — the partial
    * side keeps ≤ n candidates per (partition, group) in O(log n) per
    * row, so only `partitions × n` candidate pairs per group cross the
    * shuffle and nothing is ever sorted but the final ≤ n winners. At
    * 100 TB with billions of rows per group, shuffle volume drops from
    * the corpus to `groups × partitions × n`.
    *
    * Contract differences vs [[quotaPerGroup]] (which preserves the full
    * input row): `idCol` must be integral (the heap stores ids as
    * longs) and null-id rows are DROPPED up front (the window twin
    * ranks them; a sampling id is expected to identify its row); the
    * output carries ONLY `(groupCols…, idCol AS LONG)` — join the
    * winners back to the source frame for payload columns. The winning
    * id SET per group is identical to the window version's. */
  def quotaPerGroupAgg(df: DataFrame, groupCols: Seq[String], idCol: String,
                       n: Int, salt: String): DataFrame = {
    val bk = udaf(new BottomK(n),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    df.filter(col(idCol).isNotNull)
      .select((groupCols.map(col) :+
        hashBucket(col(idCol), salt, 1 << 30).as("__graft_qb") :+
        col(idCol).cast("long").as("__graft_qid")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bk(col("__graft_qb"), col("__graft_qid")).as("__graft_bk"))
      .select((groupCols.map(col) :+
        explode(col("__graft_bk")).as(idCol)): _*)
  }

  /** Mixture planning: given target mixture weights over sources and a
    * total token budget, compute each source's target token share, the
    * sampling RATE against its available tokens, and the implied EPOCH
    * count (rate > 1 = the source must repeat) — the sanity report run
    * before committing to a pretraining mixture (upsampling a small
    * high-quality source 10× is a decision, not an accident; cf. the
    * public data-mixture literature — GPT-3's weighted sampling table,
    * DoReMi's domain weights). Weights are normalized over the sources
    * PRESENT in the corpus; absent weight keys are ignored, unweighted
    * sources get weight 0 and appear with zero targets (they'd silently
    * vanish from the mix — the report makes that visible).
    *
    * Rates and epochs are emitted in integer MICRO units (floor), the
    * cross-engine determinism convention. One vocabulary-sized aggregate
    * (sources), a 1-row broadcast for the weight total — corpus-linear,
    * nothing driver-side.
    *
    * @return (source, avail_tokens, weight_micro, target_tokens,
    *         rate_micro, epochs_ceil) ordered by source
    */
  def mixturePlan(df: DataFrame, sourceCol: String, tokensCol: String,
                  weights: Map[String, Double],
                  budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val avail = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokensCol).cast("long")).as("avail_tokens"))
    val w = weights.toSeq.toDF("source", "w")
    val joined = avail.join(broadcast(w), Seq("source"), "left")
      .withColumn("w", coalesce(col("w"), lit(0.0)))
    // normalize over PRESENT sources: 1-row total, broadcast back
    val tot = joined.agg(sum("w").as("wtot"))
    joined.crossJoin(broadcast(tot))
      // wtot = 0 (no weight names any present source): all-zero plan,
      // not a null spray — the report stays readable and deterministic
      .withColumn("__f", when(col("wtot") > 0, col("w") / col("wtot")).otherwise(lit(0.0)))
      .withColumn("weight_micro", floor(col("__f") * 1e6).cast("long"))
      .withColumn("target_tokens", floor(col("__f") * budgetTokens).cast("long"))
      .withColumn("rate_micro",
        // double multiply, matching the oracle's `target * 1000000.0 /
        // avail` — a long multiply overflows past ~9.2e12 target tokens
        // (real pretraining budgets exceed that)
        floor(col("target_tokens").cast("double") * 1e6 / col("avail_tokens")).cast("long"))
      .withColumn("epochs_ceil",
        ceil(col("target_tokens").cast("double") / col("avail_tokens")).cast("long"))
      .select("source", "avail_tokens", "weight_micro", "target_tokens",
        "rate_micro", "epochs_ceil")
      .orderBy("source")
  }

  /** Deterministic contrastive negative sampling: `k` pseudo-random
    * negatives per anchor row (the training-pair mining step behind
    * contrastive/embedding training — in-batch negatives don't exist at
    * data-prep time, so the corpus supplies them), with NO cross join
    * and no RNG state. Each (anchor, j) pair hashes to a corpus POSITION
    * `hash56(salt:anchor#j) mod n`, and positions resolve to ids through
    * [[Ranks.globalRowNumber]]'s bucketed two-pass rank — so the plan is
    * a row-local ×k explode plus ONE corpus-linear equi-join on the rank
    * key (the 1-row corpus count rides a broadcast). Accidental
    * self-pairs (anchor drawn as its own negative, probability k/n) are
    * dropped, not re-drawn — the oracle replays the same rule.
    * Re-running over a grown corpus changes `n` and therefore redraws —
    * by design (negatives should cover the current corpus); pin `n`
    * upstream if stability across ingests matters.
    *
    * @return (id_anchor, j, id_neg), one row per surviving draw
    */
  def negativeSample(df: DataFrame, idCol: String, anchorPred: Column,
                     k: Int, salt: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ranked = Ranks.globalRowNumber(df.select(col(idCol)), idCol, idCol)
      .select(col(idCol).as("id_neg"), col("rank"))
    val nRow = df.agg(count(lit(1)).as("__graft_n"))
    val targets = df.filter(anchorPred).select(col(idCol).as("id_anchor"))
      .crossJoin(broadcast(nRow))
      .select(col("id_anchor"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"), col("__graft_n"))
      .withColumn("target",
        pmod(CrossHash.hash56(concat(lit(salt + ":"),
          col("id_anchor").cast("string"), lit("#"), col("j").cast("string"))),
          col("__graft_n")) + 1)
    targets.join(ranked, col("target") === col("rank"))
      .filter(col("id_neg") =!= col("id_anchor"))
      .select("id_anchor", "j", "id_neg")
  }

  /** Keep the top `frac` of each group by `(scoreCol desc, idCol)` — the
    * percentile-thresholding quality prune (keep the best X% per
    * language/source) without a precomputed cutoff. The threshold is
    * `rn <= ceil(frac * group_count)` in integer space (one double
    * multiply, computed identically by any engine) rather than
    * percent_rank, which NaNs on single-row groups. One shuffle on the
    * group key; rank and count share the same window partition.
    *
    * `groupCols = Seq.empty` means a GLOBAL top fraction — the windowed
    * form would then be a single-partition window over the corpus (the
    * round-6 guard tightening caught exactly this in the v5 capstone),
    * so that case routes through [[Ranks.globalRowNumber]]'s bucketed
    * two-pass rank: one rangeProbe scan yields both the bucket bounds
    * and the exact N, and the cut is the same `rn <= ceil(frac·N)` in
    * identical double math. Ordering matches `(score DESC NULLS LAST,
    * id)` via an ascending negated score with nulls mapped to +∞ and
    * NaN to -∞ (Spark's desc ranks NaN above every number); literal
    * ±Infinity scores would tie with the sentinels — beyond any real
    * scoring domain. */
  def topFractionPerGroup(df: DataFrame, groupCols: Seq[String],
                          scoreCol: String, idCol: String,
                          frac: Double): DataFrame = {
    if (groupCols.isEmpty) {
      // NaN maps to -∞ because the grouped branch's `desc` ranks NaN
      // ABOVE every number (Spark's ordering) — a bare negation would
      // leave NaN sorting LAST ascending and flip the retention verdict
      // between the two branches for the same row
      val tagged = df.withColumn("__graft_tneg",
        when(col(scoreCol).isNull, lit(Double.PositiveInfinity))
          .when(isnan(col(scoreCol).cast("double")),
            lit(Double.NegativeInfinity))
          .otherwise(-col(scoreCol).cast("double")))
      val (bounds, n) = Ranks.rangeProbe(tagged, Seq("__graft_tneg"))
      Ranks.globalRowNumber(tagged, "__graft_tneg", idCol,
          outCol = "__graft_trn", bounds = Some(bounds("__graft_tneg")))
        .filter(col("__graft_trn") <= lit(math.ceil(frac * n).toLong))
        .drop("__graft_tneg", "__graft_trn")
    } else {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(scoreCol).desc, col(idCol))
      val wAll = Window.partitionBy(groupCols.map(col): _*)
      df.withColumn("__graft_trn", row_number().over(w).cast("long"))
        .withColumn("__graft_tn", count(lit(1)).over(wAll))
        .filter(col("__graft_trn") <= ceil(lit(frac) * col("__graft_tn")))
        .drop("__graft_trn", "__graft_tn")
    }
  }

  /** Per-group WEIGHT-budget cut: keep the best-scored rows of each
    * group until their cumulative weight (tokens, bytes) fills `budget`
    * — the pretraining budget-selection rule, which differs from
    * [[topFractionPerGroup]] in the unit that matters: a mixture is
    * declared in TOKENS, and cutting by row fraction silently skews
    * toward groups with long documents. A row is kept iff the running
    * weight INCLUDING it stays ≤ budget (strictly bounded output — the
    * boundary doc that would overflow is dropped, so kept-weight ≤
    * budget always holds).
    *
    * One shuffle (the per-group window); the running sum is exact
    * integer arithmetic. Groups here are sources/domains — thousands of
    * rows each; for corpus-sized groups the same rule composes with
    * [[Ranks.globalRowNumber]]'s bucketed rank per group instead of the
    * group sort. */
  def budgetCutPerGroup(df: DataFrame, groupCols: Seq[String],
                        scoreCol: String, idCol: String,
                        weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_cum", sum(col(weightCol).cast("long")).over(w))
      .filter(col("__graft_cum") <= budget)
      .drop("__graft_cum")
  }

  /** Deterministic multi-epoch training shuffle (round 6): assign every
    * row an (epoch, shard, pos) address for `epochs` independent
    * pseudo-random permutations of the corpus — the "global shuffle"
    * a trainer needs before sharded sequential reads, WITHOUT a global
    * sort. The permutation key is the salted hash of (epoch, id), so:
    *   - each epoch is a different permutation (the hash input differs),
    *   - re-runs are replay-identical (no RNG state), and
    *   - a grown corpus preserves every existing row's key (only shard
    *     population shifts, the incremental-ingest property
    *     [[hashSplit]] documents).
    *
    * Scale shape: key + shard are row-local projections; `pos` is one
    * row_number per (epoch, shard) — a window partitioned `epochs ×
    * nShards` ways, each partition ~n/nShards rows, i.e. exactly the
    * write-side parallelism a sharded export wants (never a
    * single-partition window). Writing `partitionBy(epoch, shard)
    * sortWithinPartitions(pos)` then streams each shard in permuted
    * order. */
  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar '98 — the consistent-placement scheme behind cache
    * rings and shard routers): key k lands on argmax_s hash(s, k).
    * Pure per-row projection — no directory, no shuffle, O(shards)
    * hashes per key — and the property hash-mod placement lacks:
    * growing n → n+1 shards moves ONLY the keys whose argmax flips to
    * the new shard, an expected 1/(n+1) of the corpus, and never moves
    * a key between two old shards (`pmod` relocates ~n/(n+1) — at
    * 100 TB that is the difference between re-copying 11% and 89% of
    * the corpus on a resize). Signed-off by RendezvousSpec: exact
    * Scala replay, move-target law, measured move fractions for both
    * schemes, balance, and the zero-exchange plan.
    *
    * Determinism: weights are the salted [[CrossHash]] over
    * `"salt:shard:key"`; the argmax is `array_max` over (h, s) structs
    * — ties (impossible at 56 bits in practice) break toward the
    * larger shard id, and the DuckDB replay orders `h DESC, s DESC` to
    * match. */
  def rendezvousShard(key: Column, shards: Int,
                      salt: String = "hrw"): Column = {
    require(shards >= 1, "shards must be positive")
    val cands = array((0 until shards).map { sid =>
      struct(
        CrossHash.hash56(concat(lit(s"$salt:$sid:"), key.cast("string")))
          .as("h"),
        lit(sid.toLong).as("s"))
    }: _*)
    array_max(cands).getField("s")
  }

  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
                   nShards: Int, salt: String): DataFrame = {
    val ep = explode(array((0 until epochs).map(e => lit(e.toLong)): _*))
    val key = CrossHash.hash56(concat(lit(salt + ":"),
      col("epoch").cast("string"), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__graft_key"), col(idCol))
    df.withColumn("epoch", ep)
      .withColumn("__graft_key", key)
      .withColumn("shard", pmod(col("__graft_key"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__graft_key")
  }
}
