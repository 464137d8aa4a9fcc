package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BroadcastGenerateGuard]] — the explode-blind broadcast lint:
  * flags a raw-Generate broadcast build, stays quiet below aggregates
  * and on strategy-pinned joins, and enforces per-gate exemptions. */
class BroadcastGuardSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 2000L).map(i => (i, i % 1000)).toDF("id", "k")

  test("a raw exploded broadcast build is flagged") {
    val tiny = spark.range(4).selectExpr("id AS tid", "explode(sequence(0L, 999L)) AS k")
    val joined = corpus.join(tiny, "k")
    val bad = BroadcastGenerateGuard.offenders(joined)
    assert(bad.nonEmpty, joined.queryExecution.executedPlan.toString.take(500))
    assertThrows[IllegalStateException] {
      BroadcastGenerateGuard.check("some_gate", joined)
    }
    // the audited exemption list silences check() but not offenders()
    BroadcastGenerateGuard.check("range_join", joined)
  }

  test("a Generate below an aggregate does not flag (multiplicity collapsed)") {
    val agg = spark.range(4)
      .selectExpr("id", "explode(sequence(0L, 999L)) AS k")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val joined = corpus.join(agg, "k")
    assert(BroadcastGenerateGuard.offenders(joined).isEmpty,
      joined.queryExecution.executedPlan.toString.take(500))
  }

  test("a merge-pinned exploded join does not flag (no broadcast to find)") {
    val tiny = spark.range(4).selectExpr("id AS tid", "explode(sequence(0L, 999L)) AS k")
    val joined = corpus.join(tiny.hint("merge"), "k")
    assert(BroadcastGenerateGuard.offenders(joined).isEmpty)
  }

  test("an exploded broadcast build inside a scalar subquery is flagged") {
    // ADVICE r7: the top-level-only walk let subquery plans escape
    val tiny = spark.range(4)
      .selectExpr("id AS tid", "explode(sequence(0L, 999L)) AS k")
    tiny.createOrReplaceTempView("bgg_tiny")
    corpus.createOrReplaceTempView("bgg_corp")
    val df = spark.sql(
      """SELECT id,
        | (SELECT max(c.id + t.tid) FROM bgg_corp c JOIN bgg_tiny t
        |   ON c.k = t.k) AS m
        |FROM bgg_corp""".stripMargin)
    assert(BroadcastGenerateGuard.offenders(df).nonEmpty,
      df.queryExecution.executedPlan.toString.take(800))
  }

  test("exemptions are count-pinned: a second offender in an exempt gate fails") {
    // ADVICE r7: a bare gate-name exemption would mask a future second,
    // genuinely corpus-sided explode-broadcast added to an exempt gate
    val t1 = spark.range(4).selectExpr("id AS t1id", "explode(sequence(0L, 999L)) AS k")
    val t2 = spark.range(4).selectExpr("id AS t2id", "explode(sequence(0L, 999L)) AS k")
    val two = corpus.join(t1, "k").join(t2, "k")
    assert(BroadcastGenerateGuard.offenders(two).size >= 2,
      two.queryExecution.executedPlan.toString.take(800))
    assertThrows[IllegalStateException] {
      BroadcastGenerateGuard.check("range_join", two) // allows exactly 1
    }
  }

  test("every exempt gate name still exists in the matrix") {
    // a renamed/removed gate must not leave a stale exemption behind —
    // stale entries would silently re-open the hole for a future gate
    // that reuses the name
    val names = graft.SparkEntry.queries.keySet
    val stale = BroadcastGenerateGuard.exemptOffenders.keySet -- names
    assert(stale.isEmpty, s"stale exemptions: $stale")
  }
}
