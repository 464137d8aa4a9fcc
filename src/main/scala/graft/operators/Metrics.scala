package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed evaluation metrics for curation classifiers.
  *
  * ROC-AUC per group by the Mann–Whitney rank-sum identity: AUC is the
  * probability a random positive outscores a random negative, with ties
  * counting half — U = Σ_s pos(s)·(neg_below(s) + neg(s)/2) over score
  * values s, AUC = U/(P·N). Like [[Outliers]], the statistic is
  * computed on the SCORE HISTOGRAM: one corpus-sized shuffle with
  * map-side combine into (group, score) → (pos, neg) counts, then a
  * cumulative window over frames bounded by the group's distinct-score
  * count — domain-sized, never corpus-sized, so no global sort and no
  * per-row rank materialization (the textbook rank() formulation is a
  * whole-corpus sort per group; this is the same numbers from a
  * groupBy). Everything except the final division is integral
  * (`auc2_num` = 2U avoids the tie half), so the gate hash-compares;
  * the closing division is one IEEE double op on exact integers,
  * deterministic in any engine.
  */
object Metrics {

  /** Per-group moment panel — mean, variance, skewness, excess kurtosis
    * of an integral metric — from EXACT raw power sums: Σv, Σv², Σv³,
    * Σv⁴ accumulate in DECIMAL(38,0) (a 550-char doc's v⁴ is ~10¹¹; a
    * long accumulator overflows near 10⁸ rows, i.e. exactly at the
    * corpus sizes this engine targets — the decimal sum is the
    * 100 TB-safe accumulator, and DuckDB's HUGEINT mirrors it). One
    * aggregate, map-side combined; the only non-integral step is the
    * closing conversion of exact sums to IEEE doubles and the fixed
    * central-moment formulas, spelled identically in the SQL oracle, so
    * results round-trip to the repo's `*_micro` integers bit-equal.
    *
    * Degenerate groups (variance 0) emit null skew/kurtosis rather than
    * a 0/0 NaN. */
  def momentsByGroup(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    def dsum(c: org.apache.spark.sql.Column, name: String) =
      sum(c.cast("decimal(38,0)")).as(name)
    val sums = df.filter(v.isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), dsum(v, "s1"), dsum(v * v, "s2"),
        dsum(v * v * v, "s3"), dsum(v * v * v * v, "s4"))
    val nd = col("n").cast("double")
    val (s1, s2, s3, s4) = (col("s1").cast("double"),
      col("s2").cast("double"), col("s3").cast("double"),
      col("s4").cast("double"))
    val mean = s1 / nd
    val m2 = s2 / nd - mean * mean
    val m3 = s3 / nd - lit(3.0) * mean * (s2 / nd) +
      lit(2.0) * mean * mean * mean
    val m4 = s4 / nd - lit(4.0) * mean * (s3 / nd) +
      lit(6.0) * mean * mean * (s2 / nd) -
      lit(3.0) * mean * mean * mean * mean
    def micro(c: org.apache.spark.sql.Column) =
      round(c * lit(1e6)).cast("long")
    sums.select(col(groupCol), col("n"),
      micro(mean).as("mean_micro"),
      micro(m2).as("var_micro"),
      when(m2 > 0, micro(m3 / sqrt(m2 * m2 * m2))).as("skew_micro"),
      when(m2 > 0, micro(m4 / (m2 * m2) - lit(3.0))).as("kurt_micro"))
  }

  /** Per-group ROC-AUC of an integral score against a boolean label.
    * Returns `(groupCol, pos_n, neg_n, auc2_num, auc)`; groups missing
    * either class are dropped (AUC undefined). Null scores and null
    * labels are excluded. */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).as("__graft_s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__graft_p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__graft_q"))
    val w = Window.partitionBy(groupCol).orderBy("__graft_s")
    val cum = hist.withColumn("__graft_qb",
      sum("__graft_q").over(w) - col("__graft_q"))
    cum.groupBy(groupCol)
      .agg(
        sum("__graft_p").as("pos_n"),
        sum("__graft_q").as("neg_n"),
        sum(col("__graft_p") *
          (col("__graft_qb") * 2 + col("__graft_q"))).as("auc2_num"))
      .filter(col("pos_n") > 0 && col("neg_n") > 0)
      .withColumn("auc",
        col("auc2_num").cast("double") /
          (lit(2.0) * col("pos_n") * col("neg_n")))
  }

  /** Association audit between two categorical columns — the G-test
    * statistic and mutual information of the (a, b) contingency table,
    * the mixture diagnostic that answers "is language independent of
    * source, and by how much?" (G = 2·Σ o·ln(o·N/(ra·cb)); MI = G/2N
    * nats). Scale shape: ONE corpus shuffle with map-side combine into
    * the |A|×|B|-bounded contingency table; marginals and N reduce from
    * that table, never from the corpus again, and every join after the
    * first aggregate is category-keyed. Determinism: each cell's log
    * term rounds to integer micros BEFORE the sum (the logppl-gate
    * recipe), so the statistic accumulates in exact integers and the
    * single transcendental per cell is round-6-stable cross-engine.
    *
    * @return one row: (n, g_micro, mi_micro) — mi_micro floors by
    *         subtract-the-remainder */
  def associationAudit(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum("o").as("ra"))
    val cb = cells.groupBy("b").agg(sum("o").as("cb"))
    val n = cells.agg(sum("o").as("n"))
    val lp = round(log(col("o").cast("double") * col("n") /
      (col("ra").cast("double") * col("cb"))) * lit(1e6)).cast("long")
    // lp is already micro-nats, so Σo·lp is micro-scaled: g_micro = 2·Σo·lp
    // and mi_micro = Σo·lp div N (no further 1e6 factor)
    val num = col("__s")
    val den = col("n").cast("decimal(38,0)")
    cells.join(ra, "a").join(cb, "b").crossJoin(broadcast(n))
      .withColumn("__olp", col("o").cast("decimal(38,0)") * lp)
      .groupBy("n").agg(sum("__olp").as("__s"))
      .select(col("n"),
        (col("__s") * lit(2L)).cast("long").as("g_micro"),
        ((num - pmod(num, den)) / den).cast("long").as("mi_micro"))
  }

  /** Per-group bigram conditional entropy H(next | current) — the
    * corpus PREDICTABILITY rate in micro-nats (low = templated/
    * boilerplate-heavy text a compressor squeezes flat; the corpus-
    * level diagnostic, where perplexity gates score documents).
    * H = −Σ_{w1,w2} p(w1,w2)·ln p(w2|w1) = −(Σ c12·ln(c12/c1)) / N
    * over adjacent-pair counts. Shapes: one row-local pair explode into
    * a (group, w1, w2)-keyed count with map-side combine (vocabulary²-
    * bounded), context counts reduce FROM the pair table, and the
    * logppl determinism recipe applies — each ln rounds to integer
    * micro-nats before the Σ c12·lp sum, which accumulates in
    * DECIMAL(38,0); one exact subtract-the-remainder floor at the end.
    *
    * @return (group, n_bigrams, entropy_micro) */
  def entropyRate(docs: DataFrame, groupCol: String,
                  textCol: String = "text"): DataFrame = {
    val words = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("g"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val pairs = words.select(col("g"), explode(expr(
      "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, w[i + 1] AS w2))"))
      .as("p"))
      .select(col("g"), col("p.w1"), col("p.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy("g", "w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = pairs.groupBy("g", "w1").agg(sum("c12").as("c1"))
    val lp = round(log(col("c12").cast("double") / col("c1")) * lit(1e6))
      .cast("long")
    val num = -col("__s")
    val den = col("n_bigrams").cast("decimal(38,0)")
    pairs.join(ctx, Seq("g", "w1"))
      .withColumn("__clp", col("c12").cast("decimal(38,0)") * lp)
      .groupBy("g")
      .agg(sum("c12").as("n_bigrams"), sum("__clp").as("__s"))
      .select(col("g").as(groupCol), col("n_bigrams"),
        ((num - pmod(num, den)) / den).cast("long").as("entropy_micro"))
  }

  /** Referential-integrity audit for one FK relation: of the child
    * table's rows, how many carry a NULL key and how many carry a key
    * with no parent — the ingest data-quality check that runs before a
    * pipeline trusts a join. One LEFT ANTI join on the key (the parent
    * side reduces to DISTINCT keys first, so the probe side is
    * key-cardinality-sized) plus one scan for the null/total counts;
    * orphan rate in floor-division micros over the NON-NULL rows (a
    * null key is a different defect than a dangling one and is reported
    * separately).
    *
    * @return one row: (relation, n_rows, n_null_keys, n_orphans,
    *         orphan_micro) */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   relation: String): DataFrame = {
    val totals = child.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orphans = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    totals.crossJoin(orphans)
      .select(lit(relation).as("relation"), col("n_rows"),
        col("n_null_keys"), col("n_orphans"),
        when(col("n_rows") - col("n_null_keys") > 0,
          expr("CAST(n_orphans * 1000000 DIV (n_rows - n_null_keys)" +
            " AS BIGINT)")).otherwise(lit(0L)).as("orphan_micro"))
  }

  /** One-row-per-column table profile — the ingestion-audit primitive
    * (row count, null count, EXACT distinct count, min/max) every
    * pipeline runs before trusting a new source.
    *
    * Deliberately ONE AGGREGATE PER COLUMN, unioned: each aggregate is
    * a column-pruned parquet scan with map-side partial aggregation, so
    * C columns cost C cheap independent scans that schedule in
    * parallel — against the single-pass alternative
    * (`count_distinct` × C in one agg), which Catalyst plans as an
    * Expand ×C: every corpus row replicated C times through ONE
    * shuffle, a strictly worse wall-clock shape at 100 TB whenever the
    * scan is cheaper than the expanded shuffle (it always is on
    * columnar storage). min/max cast to string AFTER aggregating in
    * the column's own type (casting first would rank numerics
    * lexicographically).
    *
    * @return (column, n_rows, n_null, n_distinct, min_val, max_val),
    *         one row per requested column
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }
}
