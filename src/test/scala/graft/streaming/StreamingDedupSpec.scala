package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

object StreamingDedupSpec {
  case class Rec(id: Long, content: String, ts: Timestamp)
}

/** [[StreamingDedup]] — watermark-bounded exact dedup semantics (drop
  * within horizon, re-admit after eviction = bounded state forever), and
  * the late-data drop differential for watermarked windowed aggregation
  * (ST1 under actually-late input, which the parity sweeps never feed). */
class StreamingDedupSpec extends SparkSpec {
  import StreamingDedupSpec.Rec

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("cross-micro-batch duplicates within the watermark horizon are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Rec]
    val out = StreamingDedup.dedupByContent(
      src.toDF(), Seq("content"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup1")
      .outputMode("append").start()
    try {
      src.addData(Rec(1, "alpha", ts(0)), Rec(2, "beta", ts(0)))
      q.processAllAvailable()
      // batch 2: replay of "alpha" 1 min later (same content, new id) +
      // a genuinely new record — only the new one survives
      src.addData(Rec(3, "alpha", ts(1)), Rec(4, "gamma", ts(1)))
      q.processAllAvailable()
      val got = spark.table("sdedup1").select("content")
        .as[String].collect().sorted.toSeq
      assert(got === Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("state is evicted past the horizon: bounded state, documented re-admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Rec]
    val out = StreamingDedup.dedupByContent(
      src.toDF(), Seq("content"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup2")
      .outputMode("append").start()
    try {
      src.addData(Rec(1, "alpha", ts(0)))
      q.processAllAvailable()
      // advance the watermark far beyond alpha's expiry (10:00 + 10m):
      // watermark after this batch = 11:00 - 10m = 10:50 > 10:10
      src.addData(Rec(2, "other", Timestamp.valueOf("2026-01-01 11:00:00")))
      q.processAllAvailable()
      // alpha's state is gone -> the late replay is re-admitted as new
      src.addData(Rec(3, "alpha", Timestamp.valueOf("2026-01-01 11:01:00")))
      q.processAllAvailable()
      val alphas = spark.table("sdedup2").filter($"content" === "alpha").count()
      assert(alphas === 2L,
        "evicted key must be re-admitted — state cannot grow unboundedly")
    } finally q.stop()
  }

  test("watermarked tumbling agg drops late rows; stream == batch over on-time subset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Rec]
    val agg = src.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("lateagg")
      .outputMode("append").start()
    try {
      // wave 1: three rows in the 10:00 window, one in 10:10
      src.addData(Rec(1, "a", ts(1)), Rec(2, "b", ts(4)), Rec(3, "c", ts(8)),
        Rec(4, "d", ts(12)))
      q.processAllAvailable()
      // wave 2: advance watermark past the 10:00 window (max 10:12 - 5m =
      // 10:07... push to 10:21 so wm = 10:16 > 10:10 finalizes window 1)
      src.addData(Rec(5, "e", ts(21)))
      q.processAllAvailable()
      // wave 3: a LATE row for the already-finalized 10:00 window — must
      // be dropped, not re-open the window
      src.addData(Rec(6, "late", ts(2)))
      q.processAllAvailable()
      // wave 4: advance watermark past the 10:10 window so it finalizes
      src.addData(Rec(7, "f", ts(36)))
      q.processAllAvailable()

      val got = spark.table("lateagg")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      // batch over the ON-TIME subset (late row excluded), finalized
      // windows only (final wm = 10:36 - 5m = 10:31, so 10:00/10:10/10:20
      // are closed; the 10:30 window holding the sentinel never finalizes)
      assert(got === Map(
        "2026-01-01 10:00:00.0" -> 3L,
        "2026-01-01 10:10:00.0" -> 1L,
        "2026-01-01 10:20:00.0" -> 1L))
    } finally q.stop()
  }

  test("batch fallback: dedupByContent on a bounded frame == dropDuplicates") {
    import spark.implicits._
    val df = Seq(
      Rec(1, "x", ts(0)), Rec(2, "x", ts(1)), Rec(3, "y", ts(2))).toDF()
    val got = StreamingDedup.dedupByContent(df, Seq("content"), "ts", "10 minutes")
      .select("content").as[String].collect().sorted.toSeq
    assert(got === Seq("x", "y"))
  }
}
