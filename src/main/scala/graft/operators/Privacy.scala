package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-privacy guards for released training corpora: k-anonymity
  * suppression and a k-anonymity / l-diversity audit profile (Sweeney 2002;
  * Machanavajjhala 2007). Complements the span-level redaction operators
  * ([[Dedup.maskDuplicatedSpans]], the PII regex projections) with the
  * group-level guarantee: no released row is identifiable within its
  * quasi-identifier equivalence class of size < k.
  *
  * Scale notes (100 TB): both operators are one hash shuffle on the
  * quasi-identifier tuple. Suppression is a windowed count over that
  * partitioning (no join back); the profile is a straight two-level
  * aggregate. Nothing is collected, nothing is quadratic, and the QI
  * shuffle key is the same partitioning a downstream per-class release
  * writer wants.
  */
object Privacy {

  /** Keep only rows whose quasi-identifier equivalence class has at least
    * `k` members — suppression-model k-anonymity over the released rows. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("__graft_qi_n", count(lit(1)).over(w))
      .filter(col("__graft_qi_n") >= k)
      .drop("__graft_qi_n")
  }

  /** Audit profile per quasi-identifier class: member count `n`, distinct
    * sensitive values `l`, and the release verdict `kept` (n ≥ k AND
    * l ≥ minL — distinct-l-diversity, so a class can't leak its sensitive
    * attribute by uniformity even when it is large enough to release). */
  def anonymityProfile(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      k: Long,
      minL: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct(sensitive).cast("long").as("l"))
      .withColumn("kept", col("n") >= k && col("l") >= minL)
      .orderBy(quasiCols.map(col): _*)
  }
}
