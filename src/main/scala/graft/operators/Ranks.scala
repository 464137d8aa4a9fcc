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
  * domain into range buckets (boundaries from one `approxQuantile` probe —
  * approximation only affects bucket BALANCE, never rank correctness,
  * because every row with the same value lands in the same bucket);
  * (2) row_number within each bucket's partition-local window; (3) add the
  * exact cumulative offset of the preceding buckets (a ≤`buckets`-row
  * frame, broadcast back). Equivalent to `row_number() OVER (ORDER BY
  * value, tie)` row-for-row, with max partition size ≈ N/buckets.
  */
object Ranks {

  /** Exact global 1-based row number ordered by (valueCol, tieCol) — the
    * tie column must be unique (an id) so the total order, and hence the
    * rank, is deterministic.
    *
    * One driver-side `approxQuantile` probe (sampled scan) + one shuffle
    * into range buckets + one tiny offset join. No single-partition
    * exchange at any size.
    */
  def globalRowNumber(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      buckets: Int = 64,
      outCol: String = "rank"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val v = col(valueCol).cast("double")
    // boundary probe: relative error 1% is plenty — balance only
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else df.stat.approxQuantile(valueCol, probes, 0.01).distinct.sorted
    val bucketCol = bounds.zipWithIndex.foldRight(lit(bounds.length)) {
      case ((b, i), els) => when(v <= lit(b), lit(i)).otherwise(els)
    }
    val bucketed = df.withColumn("__graft_bkt", bucketCol)
    val inBucket = row_number().over(
      Window.partitionBy(col("__graft_bkt"))
        .orderBy(col(valueCol), col(tieCol)))
    // exact per-bucket counts -> exclusive running offsets (≤buckets rows;
    // the single-partition window here is over a frame bounded by the
    // bucket count, not the corpus)
    val offsets = bucketed.groupBy(col("__graft_bkt")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__graft_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__graft_bkt"), col("__off"))
    bucketed
      .join(broadcast(offsets), "__graft_bkt")
      .withColumn(outCol, (col("__off") + inBucket).cast("long"))
      .drop("__graft_bkt", "__off")
  }

  /** SQL `ntile(k)` reconstructed from an exact global rank — the scalable
    * replacement for `ntile(k) OVER (ORDER BY …)`, whose empty PARTITION BY
    * serializes the corpus into one task. Exact NTILE semantics: with
    * n = total rows, q = n div k, r = n mod k, the first r tiles hold q+1
    * rows and the rest hold q — bit-identical to the window function, so a
    * DuckDB `ntile` oracle matches value-for-value.
    *
    * Both division branches stay in integer arithmetic (`when` evaluates
    * lazily, so the q = 0 case of n < k never divides by zero: every rank
    * then satisfies the first branch). */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    require(k >= 1, "k must be >= 1")
    val q = floor(n / k).cast("long")
    val r = n % k
    when(rank <= r * (q + 1),
      floor((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((rank - r * (q + 1) - 1) / q).cast("long") + 1)
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
    * 1:1 equi-join on the target index. Nothing single-partition.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      buckets: Int = 64): DataFrame = {
    val gw = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val grouped = df
      .withColumn("__rg", row_number().over(gw))
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val globalIdx = globalRowNumber(
      df.select(col(valueCol), col(idCol)), valueCol, idCol,
      buckets, outCol = "__grank")
      .select((col("__grank") - 1).as("__idx"), col(valueCol).as("__norm"))
    val total = df.agg(count(lit(1)).as("__nn"))
    grouped
      .crossJoin(broadcast(total))
      .withColumn("__tgt",
        floor((when(col("__ng") === 1, lit(0.0))
          .otherwise((col("__rg") - 1) * lit(1.0) / (col("__ng") - 1)))
          * (col("__nn") - 1)).cast("long"))
      .join(globalIdx, col("__tgt") === col("__idx"))
      .drop("__rg", "__ng", "__nn", "__tgt", "__idx")
      .withColumnRenamed("__norm", "norm")
  }
}
