package graft.engine

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The reference preview polling protocol (handler.py:29-42, 65-100)
  * under deterministic clocks and scripted pages, plus the production
  * `Engine.previewPolled` path end-to-end over Spark. */
class PreviewCursorSpec extends AnyFunSuite {
  import PreviewCursor._

  private def rng(seed: Long) = new java.util.Random(seed)

  // -- exponential_backoff schedule (handler.py:29-42) -----------------

  test("backoff schedule: min(2^k + stagger, remaining), spends the budget exactly") {
    val s = backoffSchedule(60.0, rng(42))
    // staggers are in [0,1), so sleep k is within [2^k, 2^k + 1) until
    // the budget cap kicks in
    s.init.zipWithIndex.foreach { case (t, k) =>
      val base = math.pow(2, k)
      assert(t >= base && t < base + 1.0 || t == 60.0 - s.take(k).sum,
        s"sleep $k = $t outside [2^$k, 2^$k+1)")
    }
    // the final sleep is capped to the remaining budget: the total is
    // the timeout exactly (the loop exits when remaining < 1 ms)
    assert(math.abs(s.sum - 60.0) < 1e-9)
    // 1+2+4+...: a 60 s budget takes ~6 sleeps, never tens
    assert(s.size >= 5 && s.size <= 7, s"unexpected schedule length ${s.size}")
  }

  test("backoff schedule: sub-second budget still sleeps once, capped") {
    val s = backoffSchedule(0.5, rng(7))
    assert(s.size == 1 && math.abs(s.head - 0.5) < 1e-9)
  }

  // -- append-mode cursor ---------------------------------------------

  private class Scripted(pages: Seq[Option[Seq[Row]]]) extends Pager {
    private var i = 0
    var cancelled = false
    override def nextPage(): Option[Seq[Row]] = {
      val p = if (i < pages.size) pages(i) else None
      i += 1
      p
    }
    override def cancel(): Unit = cancelled = true
  }

  private def noSleep: Double => Unit = _ => ()

  test("append mode extends across pages and stops at next_token=None") {
    val pager = new Scripted(Seq(
      Some(Seq(Row(1))), Some(Nil), Some(Seq(Row(2), Row(3))), None))
    val r = pollAppend(pager, Seq("x"), 60.0, rng(1), noSleep)
    assert(r.rows == Seq(Row(1), Row(2), Row(3)))
    assert(r.columns == Seq("x"))
    assert(r.polls == 4 && !r.timedOut && !r.seededFake && !pager.cancelled)
  }

  test("append mode polls FIRST, then sleeps (generator yields before sleeping)") {
    // a pager that finishes on the very first poll must see zero sleeps
    var sleeps = 0
    val pager = new Scripted(Seq(None))
    val r = pollAppend(pager, Seq("x"), 60.0, rng(1), _ => sleeps += 1)
    assert(r.polls == 1 && sleeps == 0)
  }

  test("budget exhaustion cancels the job and keeps what accumulated") {
    // never finishes; 60 s budget with seeded staggers = bounded polls
    val endless = new Pager {
      var n = 0
      var cancelled = false
      override def nextPage(): Option[Seq[Row]] = { n += 1; Some(Seq(Row(n))) }
      override def cancel(): Unit = cancelled = true
    }
    val r = pollAppend(endless, Seq("n"), 60.0, rng(3), noSleep)
    assert(r.timedOut && endless.cancelled)
    // poll → sleep → … → final sleep exhausts the budget, then the
    // final drain adds up to 2 polls (a pager still yielding pages
    // after both is genuinely timed out): polls = schedule + 2
    assert(r.polls == backoffSchedule(60.0, rng(3)).size + 2)
    assert(r.rows == (1 to r.polls).map(Row(_)))
  }

  test("a job that finishes during the final sleep is drained, not cancelled") {
    // pages forever while 'running', then completes: the first
    // post-budget drain picks up the rows, the second sees None
    val pages = Iterator[Option[Seq[Row]]](
      Some(Seq(Row(1))), Some(Nil), Some(Nil), Some(Nil), Some(Nil), Some(Nil),
      Some(Seq(Row(2), Row(3))), None) ++ Iterator.continually(None)
    val pager = new Pager {
      var cancelled = false
      override def nextPage(): Option[Seq[Row]] = pages.next()
      override def cancel(): Unit = cancelled = true
    }
    val r = pollAppend(pager, Seq("x"), 60.0, rng(3), noSleep)
    // 6 in-budget polls (schedule for 60s/rng(3) is 6 sleeps), then the
    // drain gets the late rows and the completion marker
    assert(!r.timedOut, s"completed job flagged timedOut: $r")
    assert(!pager.cancelled)
    assert(r.rows == Seq(Row(1), Row(2), Row(3)))
  }

  test("empty preview seeds the dbt-test fake row (handler.py:99,127-128)") {
    val r = pollAppend(new Scripted(Seq(Some(Nil), None)), Seq("a", "b"), 60.0, rng(1), noSleep)
    assert(r.seededFake)
    assert(r.columns == Seq("failures", "should_warn", "should_error"))
    assert(r.rows == Seq(Row(0L, false, false)))
  }

  // -- change-mode cursor (handler.py:91-96) ---------------------------

  private class ScriptedChanges(pages: Seq[Option[Seq[Change]]]) extends ChangePager {
    private var i = 0
    override def nextPage(): Option[Seq[Change]] = {
      val p = if (i < pages.size) pages(i) else None
      i += 1
      p
    }
  }

  test("change mode keeps only the last change's after") {
    val r = pollChange(new ScriptedChanges(Seq(
      Some(Seq(Change(Some(Row(1))), Change(Some(Row(2))))),
      Some(Seq(Change(Some(Row(9))))),
      None)), Seq("v"), 60.0, rng(1), noSleep)
    assert(r.rows == Seq(Row(9)) && !r.seededFake)
  }

  test("change mode: a trailing delete clears the state → fake row") {
    val r = pollChange(new ScriptedChanges(Seq(
      Some(Seq(Change(Some(Row(1))))),
      Some(Seq(Change(None))), // delete envelope: after = null
      None)), Seq("v"), 60.0, rng(1), noSleep)
    assert(r.seededFake && r.rows == Seq(Row(0L, false, false)))
  }

  test("change mode: an empty page does NOT clear accumulated state") {
    val r = pollChange(new ScriptedChanges(Seq(
      Some(Seq(Change(Some(Row(5))))),
      Some(Nil), // still-running poll with nothing new
      None)), Seq("v"), 60.0, rng(1), noSleep)
    assert(r.rows == Seq(Row(5)))
  }
}

/** The production polled-preview path over a real Spark job. */
class PreviewPolledSpec extends SparkSpec {
  private def newEngine(): Engine =
    new Engine(spark, tmpDir("graft-preview"))

  test("previewPolled matches preview and reports protocol metadata") {
    val e = newEngine()
    e.createStream("pp_src", graft.schema.StreamSchema(Seq(
      graft.schema.PhysicalField("id", graft.types.FlinkType.FBigInt))))
    e.appendRows("pp_src", spark.range(500).toDF("id"))
    val sql = "SELECT id, id * 2 AS dbl FROM pp_src WHERE id < 50 ORDER BY id"
    val direct = e.preview(sql, limit = 100)
    // real sleeps: a fake clock would spend the simulated budget before
    // the Spark job produces anything. The job finishes well inside the
    // first backoff steps, so this costs a couple of seconds at most.
    val polled = e.previewPolled(sql, limit = 100, rng = new java.util.Random(1))
    assert(polled.rows == direct)
    assert(polled.columns == Seq("id", "dbl"))
    assert(!polled.timedOut && !polled.seededFake && polled.polls >= 1)
  }

  test("previewPolled budget exhaustion cancels cleanly and returns, not throws") {
    // a deliberately slow aggregate against a short poll budget: the
    // cursor must return a timed-out (fake-row, nothing accumulated)
    // result — and must NOT surface its own job-group cancellation as a
    // failure (the cancel races the worker's catch block)
    val e = new Engine(spark, tmpDir("graft-preview-to"), previewTimeoutMs = 800L)
    e.createStream("pp_slow", graft.schema.StreamSchema(Seq(
      graft.schema.PhysicalField("id", graft.types.FlinkType.FBigInt))))
    e.appendRows("pp_slow", spark.range(3).toDF("id"))
    val slow = "SELECT max(md5(CAST(r.id AS STRING))) AS m FROM range(80000000) r"
    val res = e.previewPolled(slow, rng = new java.util.Random(5))
    assert(res.timedOut, s"expected a timeout, got $res")
    assert(res.seededFake && res.rows == Seq(org.apache.spark.sql.Row(0L, false, false)))
  }

  test("previewPolled on an empty result seeds the dbt fake test row") {
    val e = newEngine()
    e.createStream("pp_empty", graft.schema.StreamSchema(Seq(
      graft.schema.PhysicalField("id", graft.types.FlinkType.FBigInt))))
    e.appendRows("pp_empty", spark.range(3).toDF("id"))
    val polled = e.previewPolled("SELECT id FROM pp_empty WHERE id < 0",
      rng = new java.util.Random(1))
    assert(polled.seededFake)
    assert(polled.columns == Seq("failures", "should_warn", "should_error"))
  }
}
