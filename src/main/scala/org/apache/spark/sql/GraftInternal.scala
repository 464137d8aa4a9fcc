package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` plan-to-Dataset constructor.
  *
  * [[graft.streaming.StreamingParity]] needs to rebuild a DataFrame after
  * surgically removing the presentation-only top-level `Sort` from a gate
  * plan (streaming append mode rejects global sorts). Spark exposes no
  * public "Dataset from LogicalPlan" API, so — like other Spark-extension
  * libraries — we host the one-line accessor inside the `sql` package.
  * Nothing else in the engine bypasses the public API.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
