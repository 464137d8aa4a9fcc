package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence analytics vs plain-Scala reference implementations: the funnel
  * fold fuzzed against min-timestamp chaining, cohort retention and the
  * transition matrix on crafted and random event logs.
  */
class SequencesSpec extends SparkSpec {

  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  /** Reference funnel: classic min-ts chaining with strict >. */
  private def chainReach(evs: Seq[(Long, String)]): Int = {
    var last = Long.MinValue
    var reached = 0
    while (reached < steps.size) {
      val nxt = evs.collect {
        case (t, s) if s == steps(reached) && t > last => t
      }
      if (nxt.isEmpty) return reached
      last = nxt.min
      reached += 1
    }
    reached
  }

  test("funnel: crafted orderings") {
    // u1 completes; u2 out of order (purchase first doesn't help later
    // steps but its second purchase does); u3 equal-ts never advances;
    // u4 only views; u5 missing middle step
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"),
      (2L, 25L, "purchase"),
      (3L, 10L, "view"), (3L, 10L, "click"),
      (4L, 10L, "view"),
      (5L, 10L, "view"), (5L, 30L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Sequences.funnel(df, steps).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, "view", 5L), (2L, "click", 2L),
      (3L, "purchase", 2L)))
  }

  test("funnel: fuzz vs min-chaining reference") {
    val rnd = new Random(7)
    for (trial <- 0 until 20) {
      val types = steps ++ Seq("noise", "error")
      val evs = (0 until 300).map { _ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(40).toLong,
          types(rnd.nextInt(types.size)))
      }
      val expected = evs.groupBy(_._1).values
        .map(u => chainReach(u.map(e => (e._2, e._3))))
        .toSeq
      val expCounts = (1 to steps.size)
        .map(s => expected.count(_ >= s).toLong)
      val out = Sequences.funnel(
        evs.toDF("user_id", "ts", "event_type"), steps)
        .orderBy("step").collect().map(_.getLong(2)).toSeq
      assert(out === expCounts, s"trial $trial")
    }
  }

  test("cohort retention: crafted weeks") {
    val day = 86400000000000L
    // u1 first active day 0, returns day 8 (week 1) and day 15 (week 2);
    // u2 first active day 3, returns day 9 (week 0, offset (9-3)/7=0)
    val df = Seq(
      (1L, 0L * day), (1L, 8L * day), (1L, 15L * day + 5L),
      (2L, 3L * day + 1L), (2L, 9L * day)
    ).toDF("user_id", "ts")
    val out = Sequences.cohortRetention(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (3L, 0L, 1L)))
  }

  test("cohort retention: users counted once per offset week") {
    val day = 86400000000000L
    val rnd = new Random(11)
    val evs = (0 until 500).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(60).toLong * day + rnd.nextInt(1000))
    }
    val out = Sequences.cohortRetention(evs.toDF("user_id", "ts"))
    // total user-week memberships == distinct (user, offset) pairs exactly
    val total = out.agg(sum("users")).collect()(0).getLong(0)
    val exact = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val days = es.map(_._2 / day)
      val c = days.min
      days.map(d => (u, (d - c) / 7)).distinct
    }.size
    assert(total === exact.toLong)
    // every cohort has an offset-0 row covering all its users
    val byCohort = out.collect().groupBy(_.getLong(0))
    byCohort.values.foreach { rows =>
      assert(rows.exists(_.getLong(1) == 0L))
    }
  }

  test("epoch-day is floor division: pre-epoch timestamps get their own day") {
    val day = 86400000000000L
    // ts = -1 ns is 1969-12-31 23:59:59.999… → day -1, NOT day 0
    // (truncation-toward-zero would fold it into day 0 and diverge from a
    // calendar CAST-to-DATE); -day exactly is day -1's midnight
    val df = Seq((1L, -1L), (2L, 0L), (3L, -day), (4L, day - 1L))
      .toDF("user_id", "ts")
    val out = Sequences.rollingActiveUsers(df, windowDays = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((-1L, 2L), (0L, 2L)))
  }

  test("rolling active users: fuzz vs brute-force window membership") {
    val day = 86400000000000L
    val rnd = new Random(23)
    for (trial <- 0 until 5) {
      val w = 1 + rnd.nextInt(9)
      val evs = (0 until 400).map { _ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(40).toLong * day + rnd.nextInt(500))
      }
      val memb = evs.map { case (u, t) => (u, t / day) }.distinct
      val observed = memb.map(_._2).distinct
      val exact = observed.sorted.map { d =>
        (d, memb.collect {
          case (u, dd) if dd > d - w && dd <= d => u
        }.distinct.size.toLong)
      }
      val got = Sequences.rollingActiveUsers(
        evs.toDF("user_id", "ts"), windowDays = w).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === exact, s"trial $trial window=$w")
    }
  }

  test("sessionize: crafted islands with gap boundaries") {
    val g = 100L
    val df = Seq(
      // u1: gap of exactly g (0->100) does NOT split (strict >); the
      // 101-gap to 201 does; 201->301 is exactly g again — same session
      (1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 201L), (1L, 4L, 301L),
      // u2: single event
      (2L, 5L, 50L)
    ).toDF("user_id", "event_id", "ts")
    val out = Sequences.sessionize(df, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out === Seq(
      (1L, 1L, 0L, 100L, 2L),
      (1L, 2L, 201L, 301L, 2L),
      (2L, 1L, 50L, 50L, 1L)))
  }

  test("sessionize == Spark session_window on random logs") {
    val rnd = new Random(43)
    for (trial <- 0 until 5) {
      val gapSec = 1 + rnd.nextInt(5)
      val evs = (0 until 300).map { k =>
        (rnd.nextInt(10).toLong, k.toLong,
          rnd.nextInt(120).toLong * 1000000000L)
      }
      val df = evs.toDF("user_id", "event_id", "ts")
      val islands = Sequences.sessionize(df, gapSec * 1000000000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val sw = df
        .withColumn("t", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"),
          session_window(col("t"), s"$gapSec seconds").as("w"))
        .agg(min("ts").as("s"), max("ts").as("e"),
          count(lit(1)).cast("long").as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(islands === sw, s"trial $trial gap=${gapSec}s")
    }
  }

  test("transition matrix: counts and floor-micro probabilities") {
    val df = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (2L, 4L, 10L, "a"), (2L, 5L, 20L, "a"),
      // equal ts: event_id tie-break fixes the order c(6) -> b(7)
      (3L, 6L, 10L, "c"), (3L, 7L, 10L, "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Sequences.transitionMatrix(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out === Seq(
      ("a", "a", 1L, 500000L), ("a", "b", 1L, 500000L),
      ("b", "a", 1L, 1000000L), ("c", "b", 1L, 1000000L)))
  }
}
