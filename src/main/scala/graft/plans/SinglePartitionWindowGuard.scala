package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Literal}
import org.apache.spark.sql.catalyst.expressions.{DenseRank, Rank, RowNumber}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer-injected lint for the engine's central scale contract:
  * a `Window` with an EMPTY partition spec serializes its entire input
  * into one task (`Window.orderBy` with no PARTITION BY — the classic
  * 100 TB scale-killer this library's [[graft.operators.Ranks]] exists
  * to avoid). On a laptop it merely runs slow; on a 1000-executor
  * cluster it runs on one of them, usually until the stage times out.
  * This rule makes the contract machine-enforced instead of
  * review-enforced.
  *
  * Registered through the same `SparkSessionExtensions` entry point as
  * the native functions ([[graft.GraftExtensions]]) — the (c)-tier
  * extension mechanism: a `Rule[LogicalPlan]` in the optimizer, not a
  * rewrite (it never changes the plan; flagged plans either log or
  * fail fast, controlled per session).
  *
  * Exemptions — single-partition windows whose input is structurally
  * BOUNDED are the library's own legitimate pattern and stay silent:
  *   - any `Aggregate` below the window (group-cardinality-sized frames:
  *     [[graft.operators.Ranks.globalRowNumber]]'s ≤buckets-row offset
  *     ladder, vocabulary ranking in [[graft.operators.Vocab]]);
  *   - any `Limit` below the window (top-k frames);
  *   - leaf relations with a known small row count (`LocalRelation`,
  *     `OneRowRelation`) — test fixtures and literal frames.
  * The walk stops at the first bounding node on each path, so a
  * corpus-wide scan ABOVE an aggregate (e.g. agg → join back to the
  * corpus → window) is still flagged.
  *
  * Mode is read per-query from SQL conf `spark.graft.guard
  * .singlePartitionWindow`: `off` (default — zero overhead beyond one
  * conf read), `warn` (one log line per flagged Window), `fail`
  * (throw — CI mode). A further exemption: the top-k RANK-LIMIT idiom
  * (rank window + literal-bounding Filter above) is skipped because
  * Spark's own rank-limit pushdown bounds it physically — see
  * [[isRankLike]]. WindowGuardSpec pins flagged and exempt shapes;
  * since round 6 [[graft.Verify]] runs the ENTIRE gate matrix in fail
  * mode (with a liveness self-check proving the rule fires), so a new
  * gate with an unbounded global window cannot reach a green round.
  */
class SinglePartitionWindowGuard extends Rule[LogicalPlan] {

  import SinglePartitionWindowGuard._

  private def bounded(plan: LogicalPlan): Boolean = plan match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case leaf if leaf.children.isEmpty => false
    // every input path must be bounded (a bounded dim joined to an
    // unbounded fact is still unbounded)
    case other => other.children.forall(bounded)
  }

  /** A rank-producing window (row_number/rank/dense_rank) directly under
    * a Filter that compares SOMETHING to a literal is the top-k idiom —
    * Spark's own rank-limit pushdown (LimitPushDownThroughWindow /
    * InferWindowGroupLimit) bounds it to `TakeOrderedAndProject` +
    * a ≤k-row window, so flagging it would be a false positive (found
    * empirically: `weighted_sample`'s Efraimidis-Spirakis top-k plans
    * exactly that shape). Detection is conservative (any literal
    * comparison above a rank window) — a lint prefers missing an exotic
    * unbounded case to failing a plan the engine was about to bound. */
  private def isRankLike(w: Window): Boolean =
    w.windowExpressions.exists(_.exists {
      case _: RowNumber | _: Rank | _: DenseRank => true
      case _ => false
    })

  private def boundsByLiteral(f: Filter): Boolean =
    f.condition.exists {
      case cmp: BinaryComparison =>
        (cmp.left.isInstanceOf[Attribute] && cmp.right.isInstanceOf[Literal]) ||
          (cmp.left.isInstanceOf[Literal] && cmp.right.isInstanceOf[Attribute])
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = SQLConf.get.getConfString(ModeKey, "off")

    def act(w: Window): Unit = {
      val msg = "single-partition Window over an unbounded input " +
        s"(no PARTITION BY): the whole input sorts in ONE task at " +
        s"scale. Use graft.operators.Ranks.globalRowNumber / " +
        s"ntileFromRank, or partition the window. Window: " +
        w.windowExpressions.map(_.sql).mkString(", ")
      if (mode == "fail") throw new IllegalStateException(msg)
      // the rule sits in a fixed-point optimizer batch that runs the
      // plan several times per query — dedupe by message so warn
      // mode emits one line per distinct offending window, not one
      // per optimizer iteration (review finding); the set is
      // bounded so a long-lived session can't grow it without limit
      else if (warnedOnce(msg)) logWarning(msg)
    }

    // manual walk instead of plan.foreach: the rank-limit exemption is a
    // property of the PATH (a literal-bounding Filter above the window,
    // possibly through Projects), which foreach cannot carry
    def walk(p: LogicalPlan, rankLimited: Boolean): Unit = p match {
      case f: Filter =>
        walk(f.child, rankLimited || boundsByLiteral(f))
      case pr: Project =>
        walk(pr.child, rankLimited)
      case w: Window =>
        if (w.partitionSpec.isEmpty && !bounded(w.child) &&
          !(rankLimited && isRankLike(w))) act(w)
        w.children.foreach(walk(_, rankLimited = false))
      case other =>
        other.children.foreach(walk(_, rankLimited = false))
    }

    if (mode != "off") walk(plan, rankLimited = false)
    plan
  }
}

object SinglePartitionWindowGuard {
  val ModeKey = "spark.graft.guard.singlePartitionWindow"

  private val MaxWarned = 1000
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** True exactly once per distinct message (per JVM, bounded). */
  private[plans] def warnedOnce(msg: String): Boolean = {
    if (warned.size > MaxWarned) warned.clear()
    warned.add(msg)
  }
}
