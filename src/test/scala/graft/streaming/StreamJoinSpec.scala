package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

object StreamJoinSpec {
  case class Imp(ad_id: Long, imp_id: Long, imp_ts: Timestamp)
  case class Clk(ad_id: Long, clk_id: Long, clk_ts: Timestamp)
}

/** [[StreamJoin.intervalJoin]] — the impression↔click attribution shape:
  * batch ≡ streaming differential across micro-batches, state eviction
  * past the interval horizon, and left-outer emission of never-matched
  * rows once the watermark finalizes them. */
class StreamJoinSpec extends SparkSpec {
  import StreamJoinSpec._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // clicks attribute to an impression of the same ad within [imp, imp+10m]
  private def attrib(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame,
                     joinType: String = "inner") =
    StreamJoin.intervalJoin(l, r, Seq("ad_id"), "imp_ts", "clk_ts",
      before = "0 minutes", after = "10 minutes",
      watermarkDelay = "2 minutes", joinType = joinType)

  private val imps = Seq(
    Imp(1, 100, ts(0)), Imp(2, 101, ts(1)), Imp(1, 102, ts(20)))
  private val clks = Seq(
    Clk(1, 500, ts(5)),   // matches imp 100 (within 10m)
    Clk(2, 501, ts(15)),  // outside imp 101's window -> no match
    Clk(1, 502, ts(21)),  // matches imp 102
    Clk(3, 503, ts(22)))  // no impression at all

  test("streaming interval join across micro-batches == batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = attrib(imps.toDF(), clks.toDF())
      .select($"imp_id", $"clk_id").as[(Long, Long)].collect().toSet
    assert(expected === Set((100L, 500L), (102L, 502L)),
      "batch fixture must exercise both match and non-match cases")

    val li = MemoryStream[Imp]; val ri = MemoryStream[Clk]
    val q = attrib(li.toDF(), ri.toDF())
      .writeStream.format("memory").queryName("sj_inner")
      .outputMode("append").start()
    try {
      // deliver interleaved, out of phase: imps first, clicks trail
      li.addData(imps.take(2)); q.processAllAvailable()
      ri.addData(clks.take(2)); q.processAllAvailable()
      li.addData(imps.drop(2)); ri.addData(clks.drop(2))
      q.processAllAvailable()
      val got = spark.table("sj_inner").select("imp_id", "clk_id")
        .as[(Long, Long)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("left-outer: unmatched impressions emit with NULL click once finalized") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[Imp]; val ri = MemoryStream[Clk]
    val q = attrib(li.toDF(), ri.toDF(), joinType = "left_outer")
      .writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      li.addData(imps); ri.addData(clks)
      q.processAllAvailable()
      // advance both watermarks far past every impression's join window
      // (imp_ts + 10m + 2m delay) so unmatched left rows finalize
      li.addData(Imp(9, 999, Timestamp.valueOf("2026-01-01 12:00:00")))
      ri.addData(Clk(9, 998, Timestamp.valueOf("2026-01-01 12:00:00")))
      q.processAllAvailable()
      // one more empty-progress round lets the no-data batch flush state
      q.processAllAvailable()
      val got = spark.table("sj_outer")
        .select($"imp_id", $"clk_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(got.contains((101L, -1L)),
        s"imp 101 (click arrived outside its window) must emit NULL-matched, got $got")
      assert(got.contains((100L, 500L)) && got.contains((102L, 502L)))
    } finally q.stop()
  }

  test("state bound: join tolerates a long stream without matching stale buffers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val li = MemoryStream[Imp]; val ri = MemoryStream[Clk]
    val q = attrib(li.toDF(), ri.toDF())
      .writeStream.format("memory").queryName("sj_evict")
      .outputMode("append").start()
    try {
      li.addData(Imp(7, 700, ts(0))); q.processAllAvailable()
      // push both watermarks way past imp 700's horizon
      li.addData(Imp(8, 800, Timestamp.valueOf("2026-01-01 13:00:00")))
      ri.addData(Clk(8, 801, Timestamp.valueOf("2026-01-01 13:00:00")))
      q.processAllAvailable()
      // a "click" for ad 7 stamped inside the old window but arriving
      // after eviction: the event-time row itself is LATE (beyond the
      // click stream's watermark) and its partner state is gone — no row
      ri.addData(Clk(7, 701, ts(5)))
      q.processAllAvailable()
      val got = spark.table("sj_evict").select($"imp_id").as[Long].collect().toSet
      assert(!got.contains(700L),
        "stale-state match after watermark eviction — state is not bounded")
    } finally q.stop()
  }

  test("batch seam: same builder on bounded frames is a plain range-predicate join") {
    import spark.implicits._
    val out = attrib(imps.toDF(), clks.toDF())
    assert(!out.isStreaming)
    assert(out.count() === 2)
    // left-outer batch keeps all impressions
    assert(attrib(imps.toDF(), clks.toDF(), "left_outer").count() === 3)
  }
}
