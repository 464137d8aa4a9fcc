package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) with the Hampel ×k rule (Leys et al. 2013, "Detecting
  * outliers: do not use standard deviation around the mean, use absolute
  * deviation around the median") — the standard robust filter for
  * corpus-curation metrics (doc length, token count, link density) where
  * the mean/stddev rule is itself dragged by the outliers it should
  * catch.
  *
  * Exactness and scale come from the same trick: medians are computed on
  * the VALUE HISTOGRAM, not the rows. `groupBy(group, value).count()` is
  * one corpus-sized shuffle with map-side combine, after which the
  * cumulative-count window runs per group over a frame bounded by the
  * group's DISTINCT-value count — domain-sized, not corpus-sized, so a
  * 100 TB corpus with integer metrics (lengths, counts) compresses to
  * the value domain before any window sees it. No `percentile_approx`
  * (the result is exact, so it hash-compares against a SQL oracle) and
  * no per-group sort of raw rows.
  *
  * Median convention: the LOWER median — the element at 1-based position
  * ceil(n/2) of the sorted group — so every statistic stays in the
  * value's own integer domain and replays exactly in SQL
  * (`cum*2 >= n`). All arithmetic is integral end to end; the flag
  * compare `|x − med| > k·MAD` multiplies instead of dividing.
  */
object Outliers {

  /** Per-group lower median of an integral column via histogram
    * compression: returns `(groupCol, medCol)`, one row per group.
    * Null values are excluded (a null length carries no evidence);
    * groups with only nulls drop out. */
  def lowerMedianByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         medCol: String = "med"): DataFrame = {
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__graft_v"))
      .agg(count(lit(1)).as("__graft_cnt"))
    val tot = hist.groupBy(groupCol)
      .agg(sum("__graft_cnt").as("__graft_n"))
    val w = Window.partitionBy(groupCol).orderBy("__graft_v")
    hist.withColumn("__graft_cum", sum("__graft_cnt").over(w))
      .join(tot, groupCol)
      // first value whose cumulative count reaches ceil(n/2): 2·cum ≥ n
      // covers both parities (2·cum is even, so for odd n it implies
      // 2·cum ≥ n+1 automatically)
      .filter(col("__graft_cum") * 2 >= col("__graft_n"))
      .groupBy(groupCol).agg(min("__graft_v").as(medCol))
  }

  /** Per-group winsorization: CLIP `valueCol` into the group's
    * [pLoPct, pHiPct] order-statistic window instead of dropping rows
    * (the outlier treatment that preserves corpus size — standard for
    * heavy-tailed curation metrics feeding downstream normalization).
    * The bound at percentile p is the value at 1-based rank ⌈p·n/100⌉,
    * an exact order statistic in the value's own domain — no
    * interpolation, so the oracle replays it exactly.
    *
    * Ranks come from [[Ranks.groupedRowNumber]] (bucketed two-pass per
    * group), NOT a per-group window — groups are corpus fractions, and
    * clipping is precisely the operation you run on the biggest ones.
    * The bounds frame is group-cardinality-sized and joins back by
    * group key. `tieCol` must be unique (ranks need a total order; the
    * bound VALUE is tie-invariant since equal values are
    * interchangeable at any rank).
    *
    * NULL convention (matches [[lowerMedianByGroup]] / [[madOutliers]]):
    * NULL values carry no evidence — they are excluded from both the
    * rank frame and the group counts (otherwise the percentile ranks
    * can land ON null rows, yielding NULL bounds and NULL output for
    * the whole group), and they pass through unclipped (outCol = NULL).
    * Rows of a group with no non-null values also pass through.
    *
    * @return the input plus `outCol` = clipped value */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                tieCol: String, pLoPct: Int, pHiPct: Int,
                outCol: String = "winsorized"): DataFrame = {
    require(0 < pLoPct && pLoPct <= pHiPct && pHiPct <= 100,
      s"need 0 < pLo <= pHi <= 100, got ($pLoPct, $pHiPct)")
    val nn = df.filter(col(valueCol).isNotNull)
    val ranked = Ranks.groupedRowNumber(
      nn.select(col(groupCol), col(valueCol), col(tieCol)),
      groupCol, valueCol, tieCol, outCol = "__graft_r")
    val counts = nn.groupBy(groupCol).agg(count(lit(1)).as("__graft_n"))
    val bounds = ranked.join(counts, groupCol)
      .filter(col("__graft_r") === expr(s"($pLoPct * __graft_n + 99) div 100")
        || col("__graft_r") === expr(s"($pHiPct * __graft_n + 99) div 100"))
      .groupBy(groupCol)
      .agg(min(valueCol).as("__graft_lo"), max(valueCol).as("__graft_hi"))
    // left join: rows whose group has no bounds (all-null group, or a
    // NULL group key) keep their row with outCol = the raw value
    df.join(bounds, Seq(groupCol), "left")
      .withColumn(outCol,
        // the value-null arm is explicit: Spark's greatest/least IGNORE
        // nulls, so the clip expression alone would fold NULL to lo
        when(col(valueCol).isNull || col("__graft_lo").isNull, col(valueCol))
          .otherwise(
            least(greatest(col(valueCol), col("__graft_lo")), col("__graft_hi"))))
      .drop("__graft_lo", "__graft_hi")
  }

  /** Rows whose `valueCol` deviates from the group's lower median by
    * more than `k` × the group's MAD (lower median of absolute
    * deviations). Output = the input columns plus `med`, `mad`,
    * `absdev`. A group whose MAD is 0 (over half the mass on one value)
    * flags every row off the modal value — the standard Hampel
    * degeneracy, deliberately kept: it is the "this source emits
    * boilerplate of one exact length" signal. Both median frames are
    * group-cardinality-sized and broadcast back, so the corpus is
    * scanned twice and shuffled only by the two histogram aggregates. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 3): DataFrame = {
    val med = lowerMedianByGroup(df, groupCol, valueCol)
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("absdev", abs(col(valueCol) - col("med")))
    val mad = lowerMedianByGroup(dev, groupCol, "absdev", medCol = "mad")
    dev.join(broadcast(mad), Seq(groupCol))
      .filter(col("absdev") > lit(k) * col("mad"))
  }
}
