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
    // sequence bounds reference a column so the array does NOT constant-
    // fold — the generator string keeps the `explode(sequence(` shape
    // range_join's audited fingerprint pins
    val tiny = spark.range(4).selectExpr("id AS tid", "explode(sequence(pmod(id, 1L), 999L)) AS k")
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

  test("exemptions are fingerprint-pinned: a second offender in an exempt gate fails") {
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

  test("a swapped offender identity fails even at the audited count") {
    // ADVICE r8: count-pinning alone would pass a plan change that
    // removed the audited benign explode-broadcast and introduced a
    // different one; the fingerprint must not match
    val tiny = spark.range(4).selectExpr("id AS tid", "explode(sequence(0L, 999L)) AS k")
    val joined = corpus.join(tiny, "k")
    assert(BroadcastGenerateGuard.offenders(joined).size == 1)
    assertThrows[IllegalStateException] {
      // hourly_quantiles' audited site is explode([0.5,0.95]) — same
      // count (1), different generator → rogue
      BroadcastGenerateGuard.check("hourly_quantiles", joined)
    }
  }

  test("an unused exemption (stale slack) warns and is reported, not failed") {
    // ADVICE r8 wanted stale slack surfaced; round 9 downgraded absence
    // to a WARN + return value after sf1 showed broadcast selection is
    // scale-dependent (range_join's audited site exists at sf0.01 and
    // legitimately exceeds the broadcast threshold at sf1) — identity
    // pinning already fails any offender outside the fingerprints, so
    // slack cannot mask a rogue site
    val clean = corpus.groupBy("k").count()
    assert(BroadcastGenerateGuard.offenders(clean).isEmpty)
    assert(BroadcastGenerateGuard.check("range_join", clean)
      == Seq("explode(sequence("))
    // a fully-exercised exemption reports no slack
    // column-bound sequence (a literal one constant-folds to an
    // UnsafeArrayData generator string and would not match the audit)
    val tiny = spark.range(4)
      .selectExpr("id AS tid", "explode(sequence(0L, id * 200L)) AS k")
    val joined = corpus.join(tiny, "k")
    assert(BroadcastGenerateGuard.offenders(joined).size == 1)
    assert(BroadcastGenerateGuard.check("range_join", joined).isEmpty)
  }

  test("strict mode escalates an unused exemption to a failure (small-sf audit)") {
    // round 10 — ADVICE r9: at the audited small scales every
    // fingerprinted site is known to exist, so its ABSENCE there means
    // the plan changed identity and the standing fingerprint could
    // silently exempt a future corpus-sided site; the small-sf Verify
    // runs enable this key (sf1+ keeps the scale-dependent warn)
    val clean = corpus.groupBy("k").count()
    spark.conf.set(BroadcastGenerateGuard.StrictUnusedKey, "fail")
    try {
      assertThrows[IllegalStateException] {
        BroadcastGenerateGuard.check("range_join", clean)
      }
      // a fully-exercised exemption still passes under strict
      val tiny = spark.range(4)
        .selectExpr("id AS tid", "explode(sequence(0L, id * 200L)) AS k")
      val joined = corpus.join(tiny, "k")
      assert(BroadcastGenerateGuard.check("range_join", joined).isEmpty)
    } finally spark.conf.unset(BroadcastGenerateGuard.StrictUnusedKey)
  }

  test("an exploded broadcast build on an IN-subquery's build side is flagged") {
    // VERDICT r8 item 6: liveness fixture for the round-8 subquery walk —
    // no gate in the matrix routes an exploded broadcast through a
    // subquery, so without this fixture reverting the walk stays green
    val tiny = spark.range(4)
      .selectExpr("id AS tid", "explode(sequence(0L, 999L)) AS k")
    tiny.createOrReplaceTempView("bgg_tiny_in")
    corpus.createOrReplaceTempView("bgg_corp_in")
    val df = spark.sql(
      """SELECT id FROM bgg_corp_in
        |WHERE id IN (SELECT c.id FROM bgg_corp_in c JOIN bgg_tiny_in t
        |             ON c.k = t.k WHERE t.tid > 0)""".stripMargin)
    assert(BroadcastGenerateGuard.offenders(df).nonEmpty,
      df.queryExecution.executedPlan.toString.take(800))
  }

  test("a Generate under a NESTED broadcast is attributed to one exchange only") {
    // ADVICE r8: the outer exchange's walk must stop at an inner
    // BroadcastExchangeExec (visited separately) — double attribution
    // of one audited site would spuriously exceed a pinned exemption
    val tiny = spark.range(4).selectExpr("id AS tid", "explode(sequence(0L, 999L)) AS k")
    val mid = spark.range(64).selectExpr("id AS mid", "id % 8 AS k")
    // tiny broadcasts into mid; the joined (still small) side broadcasts
    // into the corpus → the Generate sits under BOTH exchanges in the
    // tree but must be reported once
    val inner = mid.join(tiny.hint("broadcast"), "k")
    val joined = corpus.join(inner.hint("broadcast"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    val bad = BroadcastGenerateGuard.offenders(joined)
    // only assert single attribution when the shape actually nested
    // (two exchanges materialized with the Generate under the inner)
    if (plan.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange") >= 2)
      assert(bad.size <= 1, s"double-attributed: ${bad.mkString(" | ")}\n" +
        plan.take(800))
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
