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
}
