package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.AsOfJoin

object TemporalJoinSpec {
  case class Ev(k: String, ts: Timestamp, ev_id: Long)
  case class Ver(k: String, vts: Timestamp, rate: Double)
}

/** The temporal enrichment join's contracts: each event picks the
  * latest in-validity version at its event time; versions staler than
  * the validity TTL do NOT enrich; the streaming run (two native
  * stateful operators, append mode) accumulates exactly the batch
  * result; and the batch result equals the AsOfJoin whenever matches
  * fall inside the validity window. */
class TemporalJoinSpec extends SparkSpec {
  import TemporalJoinSpec.{Ev, Ver}

  private def ts(m: Int) =
    Timestamp.valueOf(f"2026-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  private val versions = Seq(
    Ver("a", ts(0), 1.0), Ver("a", ts(10), 2.0), Ver("a", ts(30), 3.0),
    Ver("b", ts(5), 10.0))
  private val events = Seq(
    Ev("a", ts(4), 1),   // after v1.0 only → 1.0
    Ev("a", ts(10), 2),  // exactly at v2.0 → 2.0 (≤ is inclusive)
    Ev("a", ts(29), 3),  // v2.0 still in force → 2.0
    Ev("a", ts(45), 4),  // v3.0 (15 min old, inside 20-min validity)
    Ev("b", ts(40), 5),  // only version is 35 min stale → DROPPED
    Ev("c", ts(10), 6))  // no version at all → DROPPED

  private def batchRun = {
    import spark.implicits._
    TemporalJoin.enrich(events.toDF(), versions.toDF(),
      Seq("k"), "ts", "vts", Seq("rate"),
      validity = "20 minutes", watermarkDelay = "10 minutes")
      .select("ev_id", "rate")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("batch: latest in-validity version wins; stale and missing drop") {
    assert(batchRun == Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 3.0))
  }

  test("batch result == AsOfJoin restricted to in-validity matches") {
    import spark.implicits._
    // carry the matched version's vts THROUGH the asof join (asking for
    // it as a value column) instead of reconstructing it by joining on
    // (k, rate) — that reconstruction breaks the moment a key re-issues
    // an old rate value (review)
    val asof = AsOfJoin.asOf(events.toDF(),
      versions.toDF().withColumn("v_vts", col("vts")),
      Seq("k"), "ts", "vts", Seq("rate", "v_vts"))
      .filter(col("rate").isNotNull)
      // AsOfJoin has no TTL — apply the validity cut it doesn't know
      .filter(col("ts").cast("long") - col("v_vts").cast("long") <= 20 * 60)
      .select("ev_id", "rate")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(asof == batchRun, s"asof $asof != temporal $batchRun")
  }

  test("distinct-row contract: byte-identical event rows collapse to one") {
    import spark.implicits._
    // the documented contract (TemporalJoin scaladoc): the reduce groups
    // by every event column, so duplicates without an identity column
    // merge — pinned here so the collapse is a chosen behavior, not a
    // surprise. The same events WITH distinct ids stay distinct.
    val dupNoId = Seq(("a", ts(4)), ("a", ts(4))).toDF("k", "ts")
    val n1 = TemporalJoin.enrich(dupNoId, versions.toDF(),
      Seq("k"), "ts", "vts", Seq("rate"),
      validity = "20 minutes", watermarkDelay = "10 minutes").count()
    assert(n1 == 1, s"identical rows must collapse, got $n1")
    val dupWithId = Seq(("a", ts(4), 1L), ("a", ts(4), 2L))
      .toDF("k", "ts", "ev_id")
    val n2 = TemporalJoin.enrich(dupWithId, versions.toDF(),
      Seq("k"), "ts", "vts", Seq("rate"),
      validity = "20 minutes", watermarkDelay = "10 minutes").count()
    assert(n2 == 2, s"id-carrying duplicates must both enrich, got $n2")
  }

  test("streaming run accumulates exactly the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evSrc = MemoryStream[Ev]
    val verSrc = MemoryStream[Ver]
    val q = TemporalJoin.enrich(evSrc.toDF(), verSrc.toDF(),
      Seq("k"), "ts", "vts", Seq("rate"),
      validity = "20 minutes", watermarkDelay = "10 minutes")
      .select("ev_id", "rate")
      .writeStream.format("memory").queryName("tj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // versions arrive first, events trickle, then a far-future tick on
      // BOTH sides pushes the joint watermark past every event PLUS the
      // join's state horizon (the engine delays the post-join watermark
      // by the interval span before the downstream aggregate sees it)
      verSrc.addData(versions.take(2): _*)
      evSrc.addData(events.take(3): _*)
      q.processAllAvailable()
      verSrc.addData(versions.drop(2): _*)
      evSrc.addData(events.drop(3): _*)
      q.processAllAvailable()
      verSrc.addData(Ver("z", ts(120), 0.0))
      evSrc.addData(Ev("z", ts(120), 99))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tj_out")
      .filter(col("ev_id") =!= 99)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == batchRun, s"streaming $got != batch $batchRun")
  }
}
