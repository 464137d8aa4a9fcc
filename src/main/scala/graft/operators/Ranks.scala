package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale exact ranking: global row numbers without the
  * single-partition window (`Window.orderBy` with no PARTITION BY moves
  * the whole corpus to one task — the classic 100 TB scale-killer), and
  * cross-source quantile normalization built on top of it.
  *
  * The pattern is the standard two-pass range rank: (1) split the value
  * domain into range buckets (boundaries from one [[rangeProbe]] job —
  * approximation only affects bucket BALANCE, never rank correctness,
  * because every row with the same value lands in the same bucket);
  * (2) row_number within each bucket's partition-local window; (3) add the
  * exact cumulative offset of the preceding buckets (a ≤`buckets`-row
  * frame, broadcast back). Equivalent to `row_number() OVER (ORDER BY
  * value, tie)` row-for-row, with max partition size ≈ N/buckets.
  */
object Ranks {

  /** One-job boundary probe: approximate range-bucket boundaries for EVERY
    * listed value column PLUS the exact total row count, from a single
    * aggregation scan (`percentile_approx` sketches fold map-side; no
    * driver-coordinated `approxQuantile` job per column, no separate
    * `count` job). Callers ranking several dimensions of one frame
    * ([[graft.operators.Sequences.rfmSegmentsWithCleanup]]: three) or
    * needing N anyway ([[quantileNormalize]]) pay one scan total, then
    * pass the bounds into [[globalRowNumber]]'s `bounds` parameter.
    *
    * Boundary precision only affects bucket balance, never correctness,
    * so the default sketch accuracy is plenty at any scale. */
  def rangeProbe(
      df: DataFrame,
      valueCols: Seq[String],
      buckets: Int = 64,
      accuracy: Int = 10000): (Map[String, Array[Double]], Long) = {
    require(buckets >= 1, "buckets must be >= 1")
    if (buckets == 1)
      (valueCols.map(_ -> Array.empty[Double]).toMap, df.count())
    else {
      val probes = (1 until buckets).map(_.toDouble / buckets)
      val aggs = valueCols.map { c =>
        percentile_approx(col(c).cast("double"),
          array(probes.map(lit): _*), lit(accuracy)).as(s"__graft_q_$c")
      } :+ count(lit(1)).as("__graft_n")
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val bounds = valueCols.zipWithIndex.map { case (c, i) =>
        // all-null column → null sketch → no boundaries (single bucket;
        // the nulls-first pinning below keeps ranks correct regardless)
        val arr =
          if (row.isNullAt(i)) Array.empty[Double]
          else row.getSeq[Double](i).toArray
        c -> arr.distinct.sorted
      }.toMap
      (bounds, row.getLong(valueCols.size))
    }
  }

  /** Exact global 1-based row number ordered by (valueCol, tieCol) — the
    * tie column must be unique (an id) so the total order, and hence the
    * rank, is deterministic.
    *
    * One [[rangeProbe]] boundary job (skipped when the caller supplies
    * `bounds` from a shared probe) + one shuffle into range buckets + one
    * tiny offset join. No single-partition exchange at any size.
    */
  def globalRowNumber(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      buckets: Int = 64,
      outCol: String = "rank",
      bounds: Option[Array[Double]] = None): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val v = col(valueCol).cast("double")
    val resolved: Array[Double] = bounds match {
      case Some(b) => b.distinct.sorted
      case None =>
        if (buckets == 1) Array.empty[Double]
        else rangeProbe(df, Seq(valueCol), buckets)._1(valueCol)
    }
    // NULL values sort FIRST under Spark's ascending order (the semantics
    // of the row_number() oracle this must equal) — a bare `v <= bound`
    // chain would fall through to the LAST bucket instead, inverting their
    // ranks; pin them to bucket 0, where the in-bucket nulls-first window
    // restores the total order
    val bucketCol = resolved.zipWithIndex.foldRight(lit(resolved.length)) {
      case ((b, i), els) => when(v <= lit(b), lit(i)).otherwise(els)
    }
    val bucketed = df.withColumn("__graft_bkt",
      when(v.isNull, lit(0)).otherwise(bucketCol))
    val inBucket = row_number().over(
      Window.partitionBy(col("__graft_bkt"))
        .orderBy(col(valueCol), col(tieCol)))
    // exact per-bucket counts -> exclusive running offsets (≤buckets rows;
    // the single-partition window here is over a frame bounded by the
    // bucket count, not the corpus)
    val offsets = bucketed.groupBy(col("__graft_bkt"))
      .agg(count(lit(1)).as("__graft_n"))
      .withColumn("__graft_off",
        coalesce(sum(col("__graft_n")).over(
          Window.orderBy(col("__graft_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__graft_bkt"), col("__graft_off"))
    bucketed
      .join(broadcast(offsets), "__graft_bkt")
      .withColumn(outCol, (col("__graft_off") + inBucket).cast("long"))
      .drop("__graft_bkt", "__graft_off")
  }

  /** Length-bucketed batch assignment with exact padding-waste
    * accounting — the dynamic-batching prep step of every training run:
    * group documents into length buckets, order each bucket by
    * (length, id), cut into fixed-size batches, and report per batch
    * how much of the padded tensor is waste (`max_len·n − Σlen`).
    * Random batching pads everything to the batch max; length-bucketed
    * batching is THE standard fix, and this operator quantifies exactly
    * what it buys. The in-bucket order comes from [[groupedRowNumber]]
    * (length buckets are corpus-sized strata — a per-bucket window is
    * the single-partition hazard with a different name); everything
    * after the rank is one (bucket, batch)-keyed aggregate. Waste is
    * floor-division micros of the padded volume.
    *
    * @param edges ascending upper bounds; lengths above the last edge
    *              land in bucket `edges.length`
    * @return (bucket, batch, n_docs, max_len, sum_len, waste_micro) */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenCol: String,
                          edges: Seq[Long], batchSize: Int): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && batchSize >= 1,
      "edges must be ascending and batchSize positive")
    val len = col(lenCol).cast("long")
    val bucket = edges.zipWithIndex
      .foldRight(lit(edges.length): Column) { case ((e, i), els) =>
        when(len <= lit(e), lit(i)).otherwise(els)
      }
    val bucketed = df.filter(len.isNotNull)
      .select(col(idCol), len.as("__len"), bucket.as("bucket"))
    groupedRowNumber(bucketed, "bucket", "__len", idCol, outCol = "__rn")
      .withColumn("batch", expr(s"CAST((__rn - 1) DIV $batchSize AS BIGINT)"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_docs"), max("__len").as("max_len"),
        sum("__len").as("sum_len"))
      .withColumn("waste_micro",
        when(col("max_len") > 0,
          expr("CAST((max_len * n_docs - sum_len) * 1000000" +
            " DIV (max_len * n_docs) AS BIGINT)")).otherwise(lit(0L)))
  }

  /** Exact 2-D skyline (Pareto frontier, maximize both columns): the
    * rows no other row dominates (x' ≥ x ∧ y' ≥ y, one strict). The
    * classical formulation sorts by x desc and keeps rows beating the
    * running y-max — a total order, i.e. the single-partition hazard —
    * so this runs the SAME two-pass bucket decomposition as
    * [[globalRowNumber]]: (1) reduce to the per-x y-max table
    * (value-domain-sized, one shuffle with map-side combine; rows of an
    * x below its x's y-max are dominated within the column), (2) range-
    * bucket by x, exclusive running y-max INSIDE each bucket's window,
    * (3) carry the cross-bucket running max through the ≤buckets-row
    * offset ladder — identical keep decisions to the global sort,
    * max partition ≈ |domain|/buckets. A kept x joins back to recover
    * every row AT the frontier point (equal points don't dominate each
    * other, so duplicates all survive).
    *
    * @return the skyline rows of `df` (original columns) */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                buckets: Int = 64): DataFrame = {
    val perX = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    val resolved = rangeProbe(perX, Seq(xCol), buckets)._1(xCol)
      .distinct.sorted
    val v = col(xCol).cast("double")
    val bucketCol = resolved.zipWithIndex.foldRight(lit(resolved.length)) {
      case ((b, i), els) => when(v <= lit(b), lit(i)).otherwise(els)
    }
    val bucketed = perX.withColumn("__graft_bkt", bucketCol)
    // exclusive running max INSIDE the bucket, in x-desc order
    val wIn = Window.partitionBy(col("__graft_bkt"))
      .orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // cross-bucket carry-in: max of every HIGHER bucket's ymax (the
    // ladder is ≤buckets rows — the same bounded window as the rank
    // offset ladder)
    val ladder = bucketed.groupBy(col("__graft_bkt"))
      .agg(max("__ymax").as("__bmax"))
      .withColumn("__carry",
        max(col("__bmax")).over(Window.orderBy(col("__graft_bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__graft_bkt"), col("__carry"))
    val kept = bucketed
      .join(broadcast(ladder), "__graft_bkt")
      .withColumn("__prior",
        greatest(max(col("__ymax")).over(wIn), col("__carry")))
      .filter(col("__prior").isNull || col("__ymax") > col("__prior"))
      .select(col(xCol).as("__sx"), col("__ymax"))
    df.join(kept, df(xCol) === col("__sx") && df(yCol) === col("__ymax"))
      .select(df.columns.map(df(_)): _*)
  }

  /** Key-skew profile: the pre-shuffle diagnostic a join/agg planner
    * reads before choosing salt factors — `(n_keys, total_rows,
    * max_cnt, maxmean_micro, gini_micro)` for a key column, all exact
    * integers. `maxmean_micro` = max·n·1e6 div total (how many times
    * the hottest key exceeds the mean — the direct salt multiplier);
    * `gini_micro` = ⌊Σ(2r−n−1)·c_r · 1e6 / (n·total)⌋ over counts
    * ranked ascending (0 = uniform, →1e6 = one key owns everything).
    * The rank is [[globalRowNumber]]'s bucketed two-pass (key counts
    * are VOCABULARY-sized — a bare window here is the single-partition
    * killer); rank ties on equal counts don't affect the sum (the
    * weight set within a tie group is fixed), but the key tiebreak
    * keeps the replay deterministic anyway. Products ride
    * DECIMAL(38,0) and the micro floors are exact
    * subtract-the-remainder divisions. */
  def skewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
    val ranked = globalRowNumber(counts, "cnt", "k", outCol = "r")
    def flooredMicro(num: Column, den: Column): Column =
      ((num - pmod(num, den)) / den).cast("long")
    val dec = "decimal(38,0)"
    ranked.agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("total_rows"),
      max("cnt").as("max_cnt"),
      sum((lit(2) * col("r") - lit(1)).cast(dec) * col("cnt")).as("__wsum"))
      .withColumn("__gnum",
        (col("__wsum") - col("n_keys").cast(dec) * col("total_rows"))
          * lit(1000000L))
      .select(col("n_keys"), col("total_rows"), col("max_cnt"),
        flooredMicro(
          col("max_cnt").cast(dec) * col("n_keys") * lit(1000000L),
          col("total_rows").cast(dec)).as("maxmean_micro"),
        flooredMicro(col("__gnum"),
          col("n_keys").cast(dec) * col("total_rows")).as("gini_micro"))
  }

  /** Exact per-group 1-based row number ordered by `(valueCol, tieCol)`
    * within `groupCol` — `row_number() OVER (PARTITION BY g ORDER BY v,
    * t)` without group-sized window partitions. A per-group window is
    * only safe when every group is small; for strata like language or
    * source a single group is a constant fraction OF THE CORPUS, which
    * re-creates the single-partition hazard with a different name. Same
    * two-pass shape as [[globalRowNumber]], per group: (1) one scan
    * computes every group's approximate value-quantile boundaries
    * (group-cardinality-sized result, joined back — boundary precision
    * affects balance, never correctness); (2) row_number within
    * `(group, bucket)` partitions of ≈ group_n/buckets rows; (3) add the
    * group's exclusive bucket offsets (a groups×buckets frame whose
    * running sum windows per group over ≤ `buckets` rows). All joins are
    * equi-keyed; nothing is partitioned by group alone.
    *
    * `tieCol` must be unique within a group for a deterministic order.
    * NULL values rank first, matching the window-function semantics. */
  def groupedRowNumber(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieCol: String,
      buckets: Int = 64,
      outCol: String = "rank"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val v = col(valueCol).cast("double")
    val probes = (1 until buckets).map(_.toDouble / buckets)
    val bounds =
      if (buckets == 1)
        df.select(col(groupCol)).distinct()
          .withColumn("__graft_qs", array().cast("array<double>"))
      else
        df.groupBy(groupCol).agg(
          array_sort(array_distinct(coalesce(
            percentile_approx(v, array(probes.map(lit): _*), lit(10000)),
            array().cast("array<double>")))).as("__graft_qs"))
    // bucket = #boundaries strictly below v (equal values always share a
    // bucket); NULLs pin to bucket 0 where the nulls-first in-bucket
    // window restores the total order
    val bucketed = df.join(bounds, groupCol)
      .withColumn("__graft_bkt",
        when(v.isNull, lit(0)).otherwise(
          size(filter(col("__graft_qs"), b => b < v))))
      .drop("__graft_qs")
    val inBucket = row_number().over(
      Window.partitionBy(col(groupCol), col("__graft_bkt"))
        .orderBy(col(valueCol), col(tieCol)))
    val offsets = bucketed.groupBy(col(groupCol), col("__graft_bkt"))
      .agg(count(lit(1)).as("__graft_n"))
      .withColumn("__graft_off",
        coalesce(sum(col("__graft_n")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__graft_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__graft_bkt"), col("__graft_off"))
    bucketed
      .join(offsets, Seq(groupCol, "__graft_bkt"))
      .withColumn(outCol, (col("__graft_off") + inBucket).cast("long"))
      .drop("__graft_bkt", "__graft_off")
  }

  /** SQL `ntile(k)` reconstructed from an exact global rank — the scalable
    * replacement for `ntile(k) OVER (ORDER BY …)`, whose empty PARTITION BY
    * serializes the corpus into one task. Exact NTILE semantics: with
    * n = total rows, q = n div k, r = n mod k, the first r tiles hold q+1
    * rows and the rest hold q — bit-identical to the window function, so a
    * DuckDB `ntile` oracle matches value-for-value.
    *
    * Divisions run in DECIMAL (exact at any long magnitude — a double
    * quotient would round above 2^52 and misplace a tile boundary); `when`
    * evaluates lazily, so the q = 0 case of n < k never divides by zero:
    * every rank then satisfies the first branch. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    require(k >= 1, "k must be >= 1")
    def floorDiv(a: Column, b: Column): Column =
      floor(a.cast("decimal(38,0)") / b.cast("decimal(38,0)")).cast("long")
    val q = floorDiv(n, lit(k))
    val r = n % k
    when(rank <= r * (q + 1), floorDiv(rank - 1, q + 1) + 1)
      .otherwise(r + floorDiv(rank - r * (q + 1) - 1, q) + 1)
  }

  /** Cross-source quantile normalization (distribution alignment, as in
    * microarray quantile normalization / score calibration): each row's
    * value is replaced by the GLOBAL value at the same quantile position
    * the row occupies WITHIN its group, so every group's normalized
    * distribution is the global one and scores are comparable across
    * heterogeneous sources.
    *
    * position: pr = (r_g − 1)/(n_g − 1) (0 for singleton groups), mapped
    * to the global order statistic at floor(pr · (N − 1)). All ranks are
    * exact integers; the one double expression is spelled identically in
    * the SQL oracle, so the mapping is bit-deterministic.
    *
    * Shuffles: one per-group window, the bucketed global rank, and the
    * 1:1 equi-join on the target index. Nothing single-partition. The
    * bucket boundaries and the exact N come from ONE [[rangeProbe]] job
    * (previously a per-call `approxQuantile` job plus a separate count
    * job — two extra scans, now one).
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      buckets: Int = 64): DataFrame = {
    // temp columns use the __graft_ prefix; the output lands in `norm`
    // (callers with a pre-existing `norm` column must rename it first —
    // same contract as every fixed-output-name operator in this package)
    val gw = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val grouped = df
      .withColumn("__graft_rg", row_number().over(gw))
      .withColumn("__graft_ng",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val (bounds, nTotal) = rangeProbe(df, Seq(valueCol), buckets)
    val globalIdx = globalRowNumber(
      df.select(col(valueCol), col(idCol)), valueCol, idCol,
      buckets, outCol = "__graft_rank", bounds = Some(bounds(valueCol)))
      .select((col("__graft_rank") - 1).as("__graft_idx"),
        col(valueCol).as("__graft_norm"))
    grouped
      .withColumn("__graft_tgt",
        floor((when(col("__graft_ng") === 1, lit(0.0))
          .otherwise((col("__graft_rg") - 1) * lit(1.0)
            / (col("__graft_ng") - 1)))
          * lit(nTotal - 1)).cast("long"))
      .join(globalIdx, col("__graft_tgt") === col("__graft_idx"))
      .drop("__graft_rg", "__graft_ng", "__graft_tgt", "__graft_idx")
      .withColumnRenamed("__graft_norm", "norm")
  }
}
