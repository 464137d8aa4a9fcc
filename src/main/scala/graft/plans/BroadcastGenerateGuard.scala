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

  /** Gates whose flagged broadcasts are deliberate — BOUNDED-multiplier
    * explodes on genuinely small sides — keyed to the EXACT offender
    * count observed in the audit (Probe bcast at sf0.001 / sf0.01 /
    * sf0.1, identical at all three). Count-pinned (round 8 — ADVICE r7):
    * a bare gate-name exemption would silence a FUTURE second,
    * genuinely corpus-sided explode-broadcast added to an exempt gate;
    * with the count pinned, any new site in an exempt gate still fails. */
  val exemptOffenders: Map[String, Int] = Map(
    // pred-filtered QUERY side exploded ×nprobe — broadcasting the
    // handful of probe rows against the corpus is the intended plan
    "ann_ivf_topk" -> 1, "ann_lsh_topk" -> 1, "ann_pq_topk" -> 1,
    // 2-element quantile literal explode (exact_quantile broadcasts it
    // at two join sites — both audited)
    "exact_quantile" -> 2, "hourly_quantiles" -> 1,
    "weighted_quantile" -> 1,
    // salt-literal explode on the replicated dim side of the salted join
    "skew_salted_join" -> 1,
    // INTERVAL (dim) side exploded ×span/width — broadcasting exploded
    // campaigns against the point corpus is the right plan at any scale
    "range_join" -> 1)

  /** Back-compat membership view (Probe's `[exempt]` tag). */
  def exemptGates(gate: String): Boolean = exemptOffenders.contains(gate)

  /** Generator strings of every raw-Generate broadcast build in the
    * frame's static physical plan; empty = clean. Walks NESTED adaptive
    * plans and subquery plans too (round 8 — ADVICE r7: the former
    * top-level-only walk let an exploded broadcast build inside a
    * scalar/IN subquery or a nested AQE wrapper escape the lint). */
  def offenders(df: DataFrame): Seq[String] = {
    // AQE wraps before exchanges are inserted (inputPlan has no
    // BroadcastExchange nodes); its executedPlan accessor returns the
    // prepared current plan — pre-execution, the initial plan with the
    // statically-chosen exchanges this guard inspects
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other
    }
    def generates(p: SparkPlan): Seq[GenerateExec] = unwrap(p) match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec => Nil
      case g: GenerateExec => g +: g.children.flatMap(generates)
      case other => other.children.flatMap(generates)
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(plan: SparkPlan): Unit = {
      val p = unwrap(plan)
      if (!seen.add(p)) return // shared subquery instances: visit once
      p.foreach { node =>
        node match {
          case b: BroadcastExchangeExec =>
            generates(b.child).foreach(g =>
              out += g.boundGenerator.toString.take(120))
          case a: AdaptiveSparkPlanExec => walk(a) // nested AQE wrapper
          case _ => ()
        }
        // scalar/IN/EXISTS subqueries hang off expressions, not
        // children — each carries its own physical plan to lint
        node.subqueries.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  /** Throw if `df`'s plan broadcasts an exploded side beyond the gate's
    * audited exemption count (0 for non-exempt gates). */
  def check(gate: String, df: DataFrame): Unit = {
    val bad = offenders(df)
    val allowed = exemptOffenders.getOrElse(gate, 0)
    if (bad.size > allowed)
      throw new IllegalStateException(
        s"BroadcastGenerateGuard: gate '$gate' broadcasts ${bad.size} " +
          s"exploded join side(s), audited exemption allows $allowed " +
          s"(estimate is explode-blind — pin merge/shuffle_hash or " +
          s"re-audit the exemption): ${bad.mkString(" | ")}")
  }
}
