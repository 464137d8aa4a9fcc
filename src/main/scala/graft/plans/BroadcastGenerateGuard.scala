package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** The third scale lint (round 7): no BROADCAST build whose subtree
  * contains a raw Generate (explode/posexplode).
  *
  * Catalyst sizes a Generate by its column-pruned CHILD — the explode
  * multiplicity never enters the estimate — so an exploded posting side
  * is "a few KB" at ANY corpus size and becomes the broadcast build of
  * its join. Measured consequences before the round-7 sweep: the LSH
  * bucket join broadcast its 134M-row probe side at sf1 (a hard
  * `Cannot broadcast ... 12.9 GiB` failure with 512-table layouts, and
  * a silent ~5 GB broadcast with the old 48-table ones), and the
  * ngram/containment prefix joins were broadcasting corpus×shingles
  * sides that merely hadn't crossed the 8 GiB limit yet. Every
  * corpus-sided posting join now pins its strategy (merge /
  * shuffle_hash); this guard makes the class unshippable the way
  * SinglePartitionWindowGuard retired global windows.
  *
  * Unlike the optimizer-rule lints, broadcast selection happens at
  * PHYSICAL planning, so this check walks the (pre-execution, AQE
  * initial) SparkPlan rather than riding SparkSessionExtensions. The
  * walk stops at aggregates — a groupBy collapses explode multiplicity
  * to its key cardinality, so a Generate below one no longer drives the
  * build size (gram-keyed aggregates are a separate, estimate-linear
  * class). [[exemptGates]] carries the audited by-design sites; the
  * per-site triage record lives in `tools.Probe.bcastMain`'s scaladoc.
  */
object BroadcastGenerateGuard {

  /** Gates whose flagged broadcast is deliberate — a BOUNDED-multiplier
    * explode on a genuinely small side (audit record: Probe bcast at
    * sf0.001 / sf0.01 / sf0.1, identical set at all three). */
  val exemptGates: Set[String] = Set(
    // pred-filtered QUERY side exploded ×nprobe — broadcasting the
    // handful of probe rows against the corpus is the intended plan
    "ann_ivf_topk", "ann_lsh_topk", "ann_pq_topk",
    // 2-element quantile literal explode
    "exact_quantile", "hourly_quantiles", "weighted_quantile",
    // salt-literal explode on the replicated dim side of the salted join
    "skew_salted_join",
    // INTERVAL (dim) side exploded ×span/width — broadcasting exploded
    // campaigns against the point corpus is the right plan at any scale
    "range_join")

  /** Generator strings of every raw-Generate broadcast build in the
    * frame's static physical plan; empty = clean. */
  def offenders(df: DataFrame): Seq[String] = {
    // AQE wraps before exchanges are inserted (inputPlan has no
    // BroadcastExchange nodes); its executedPlan accessor returns the
    // prepared current plan — pre-execution, the initial plan with the
    // statically-chosen exchanges this guard inspects
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def generates(p: SparkPlan): Seq[GenerateExec] = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec => Nil
      case g: GenerateExec => g +: g.children.flatMap(generates)
      case other => other.children.flatMap(generates)
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    unwrap(df.queryExecution.executedPlan).foreach {
      case b: BroadcastExchangeExec =>
        generates(b.child).foreach(g =>
          out += g.boundGenerator.toString.take(120))
      case _ => ()
    }
    out.toSeq
  }

  /** Throw if `df`'s plan broadcasts an exploded side and `gate` is not
    * in the audited exemption list. */
  def check(gate: String, df: DataFrame): Unit = {
    val bad = offenders(df)
    if (bad.nonEmpty && !exemptGates(gate))
      throw new IllegalStateException(
        s"BroadcastGenerateGuard: gate '$gate' broadcasts an exploded " +
          s"join side (estimate is explode-blind — pin merge/shuffle_hash " +
          s"or add an audited exemption): ${bad.mkString(" | ")}")
  }
}
