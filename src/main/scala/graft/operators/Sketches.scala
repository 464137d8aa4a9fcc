package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch rollups (Apache DataSketches HLL,
  * Spark's `hll_sketch_agg` / `hll_union_agg` builtin family) — the
  * 100 TB pattern behind "how many distinct users/URLs/tokens" asked
  * repeatedly: persist one SKETCH per (partition × group) at ingest,
  * then answer any coarser rollup by UNIONING sketches — kilobytes per
  * group move, the raw corpus is never rescanned. HLL register merge is
  * max-per-register, so estimates are ORDER-INDEPENDENT and replays are
  * deterministic (the property SketchesSpec pins: union of shard
  * sketches ≡ whole-corpus sketch, bit-for-bit).
  *
  * The estimate↔exact drift contract follows the `approx_distinct` /
  * `approx_quantiles` convention: gates emit deterministic columns only
  * and assert the sketch inside the plan, so the approximate path can
  * never silently rot.
  */
object Sketches {

  /** Per-group HLL sketches: one shuffle on the group keys; sketch
    * buffers fold map-side (partial aggregation), so the shuffle moves
    * ≤ partitions × groups × ~(2^lgK) bytes — not rows. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll a sketch table UP to coarser grain (possibly global:
    * `coarser = Nil`) by unioning sketches — the raw data is not
    * touched. Emits the estimate alongside the merged sketch so the
    * result can keep rolling up. */
  def rollup(sketches: DataFrame, coarser: Seq[String]): DataFrame = {
    val grouped =
      if (coarser.isEmpty) sketches.agg(hll_union_agg(col("sketch")).as("sketch"))
      else sketches.groupBy(coarser.map(col): _*)
        .agg(hll_union_agg(col("sketch")).as("sketch"))
    grouped.withColumn("estimate", hll_sketch_estimate(col("sketch")))
  }

  /** In-plan drift assertion (the self-checking-sketch convention):
    * TRUE when `est` is within `tol` relative error of `exact`, else the
    * whole job fails with the drift in the message — never a silently
    * wrong approximate answer. */
  def withinTolerance(est: Column, exact: Column, tol: Double): Column = {
    val drift = abs(est - exact.cast("double")) /
      greatest(exact.cast("double"), lit(1.0))
    when(assert_true(drift <= lit(tol),
      concat(lit(s"hll estimate drifted beyond $tol: rel="), drift)).isNull,
      drift <= lit(tol))
  }
}
