package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sketches

object StreamingDistinctSpec {
  case class Hit(source: String, url: String)
  case class TsHit(ts: Timestamp, source: String, url: String)
}

/** The streaming distinct-count monitor's contracts:
  *  - update-mode running totals equal the one-shot batch HLL aggregate
  *    over the same rows (order-independence makes this EXACT equality
  *    of estimates, not a tolerance check);
  *  - windowed append-mode rows are final and equal the batch windowed
  *    aggregate; closed windows leave state (eviction);
  *  - the foreachBatch-maintained standing sketch table folds shards to
  *    the whole-corpus table in any order. */
class StreamingDistinctSpec extends SparkSpec {
  import StreamingDistinctSpec.{Hit, TsHit}

  test("update-mode running estimate: error band, monotone, replay-identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 5000).map(i =>
      Hit(if (i % 4 == 0) "crawl" else "forum", s"u${i % 1337}"))

    // NOTE: exact equality vs the one-shot batch sketch is NOT the HLL
    // contract — DataSketches unions go through an HLL_8 gadget, so a
    // union-built estimate can differ by a few counts from a
    // direct-built one (both stay inside the lgK error band). The
    // contracts that DO hold, pinned here: error band vs exact truth,
    // monotone growth per group, and bit-identical replay.
    def run(name: String): Map[String, Seq[Long]] = {
      val src = MemoryStream[Hit]
      val q = StreamingDistinct.track(src.toDF(), Seq("source"), "url")
        .drop("sketch")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        all.grouped(900).foreach { chunk =>
          src.addData(chunk: _*); q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    }
    val emissions = run("sd_track")

    val exact = all.map(h => (h.source, h.url)).distinct
      .groupBy(_._1).view.mapValues(_.size).toMap
    emissions.foreach { case (s, ests) =>
      // emissions arrive in trigger order per group: monotone running total
      assert(ests == ests.sorted, s"running estimate not monotone for $s: $ests")
      assert(math.abs(ests.last - exact(s)).toDouble / exact(s) < 0.05,
        s"final estimate ${ests.last} too far from exact ${exact(s)} for $s")
    }
    // replay determinism: the same stream replays to identical emissions
    assert(run("sd_track2") == emissions,
      "replaying the identical stream must reproduce every estimate")
  }

  test("windowed append: final rows equal batch windows, state evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val early = (1 to 600).map(i => TsHit(ts(i % 10), "a", s"u${i % 250}"))
    val late = (1 to 300).map(i => TsHit(ts(40 + i % 5), "a", s"v${i % 99}"))

    val src = MemoryStream[TsHit]
    val q = StreamingDistinct.windowed(src.toDF(), "ts", "5 minutes",
        "10 minutes", Seq("source"), "url")
      .drop("sketch")
      .writeStream.format("memory").queryName("sd_win")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData(early: _*); q.processAllAvailable()
      // advance the watermark far past the early windows → they close
      src.addData(late: _*); q.processAllAvailable()
      src.addData(TsHit(ts(59), "a", "w1")); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sd_win")
      .select("win_start", "source", "estimate")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // exact distinct per (10-min window, source) — the HLL contract is
    // the error band, NOT bit-equality with a one-shot batch sketch
    // (estimator selection is union-history-dependent; see track test)
    val exact = (early ++ late)
      .groupBy(h => (Timestamp.valueOf(
        f"2026-01-01 10:${h.ts.toLocalDateTime.getMinute / 10 * 10}%02d:00"),
        h.source))
      .view.mapValues(_.map(_.url).distinct.size).toMap
    // every window except the still-open tail must have emitted finals
    assert(exact.size >= 2 && got.size >= exact.size - 2,
      s"closed windows missing: got=${got.keySet} want=${exact.keySet}")
    got.foreach { case (key, est) =>
      val ex = exact(key)
      assert(math.abs(est - ex).toDouble / ex < 0.05,
        s"window $key estimate $est too far from exact $ex")
    }
  }

  test("ingest crash: at-least-once replay cannot move the standing sketch table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 3000).map(i =>
      Hit(if (i % 3 == 0) "x" else "y", s"d${i % 701}"))
    val chunks = all.grouped(1000).toSeq

    // maintain the standing table via foreachBatch + updateDistinctSketch,
    // optionally dying AFTER the swap lands but BEFORE the offset commit
    // on batch 1 — the restart then REFOLDS that batch. Register merge is
    // idempotent (max of the same values), so the double-fold must leave
    // the table where the uninterrupted run puts it: HLL dedup state is
    // the sketch you can maintain under at-least-once delivery with no
    // dedup machinery, unlike additive counts (the quantile-sketch path
    // guards the same hazard with engine-epoch dedup instead).
    def run(crash: Boolean): Map[String, Long] = {
      val dir = tmpDir(s"bloomhll-$crash"); val ckpt = tmpDir(s"ck-$crash")
      val src = MemoryStream[Hit]
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def start() = src.toDF().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val updated =
            if (new java.io.File(s"$dir/sketch").exists())
              Sketches.updateDistinctSketch(
                spark.read.parquet(s"$dir/sketch"), b, Seq("source"), "url")
            else Sketches.distinctSketch(b, Seq("source"), "url")
          updated.write.mode("overwrite").parquet(s"$dir/next")
          spark.read.parquet(s"$dir/next").write.mode("overwrite")
            .parquet(s"$dir/sketch")
          if (crash && id == 1L && !crashed.getAndSet(true))
            sys.error("injected crash after swap, before offset commit")
          ()
        }.start()

      val q1 = start()
      src.addData(chunks(0): _*); q1.processAllAvailable()
      src.addData(chunks(1): _*)
      try { q1.processAllAvailable(); q1.awaitTermination(30000); () }
      catch { case _: Exception => () }
      if (crash) {
        assert(q1.exception.isDefined, "injected crash did not kill the query")
        val q2 = start() // replays batch 1, then takes new traffic
        src.addData(chunks(2): _*); q2.processAllAvailable(); q2.stop()
      } else {
        src.addData(chunks(2): _*); q1.processAllAvailable(); q1.stop()
      }
      spark.read.parquet(s"$dir/sketch")
        .select(col("source"), hll_sketch_estimate(col("sketch")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val clean = run(crash = false)
    assert(run(crash = true) == clean,
      "refolding the replayed batch must not move any estimate")
    val exact = all.map(h => (h.source, h.url)).distinct
      .groupBy(_._1).view.mapValues(_.size).toMap
    clean.foreach { case (s, e) =>
      assert(math.abs(e - exact(s)).toDouble / exact(s) < 0.05, s"$s: $e")
    }
  }

  test("shard-folded distinct-sketch table: replay-identical, in band for any order") {
    import spark.implicits._
    val all = (1 to 4000).map(i =>
      Hit(if (i % 3 == 0) "x" else "y", s"d${(i * 2654435761L) % 997}"))
    def fold(order: Seq[Seq[Hit]]) = order.foldLeft(
      Sketches.distinctSketch(
        all.toDF("source", "url"), Seq("source"), "url").limit(0)) {
      (standing, shard) =>
        Sketches.updateDistinctSketch(standing,
          shard.toDF("source", "url"), Seq("source"), "url")
    }
    val shards = all.grouped(1100).toSeq
    def est(df: org.apache.spark.sql.DataFrame) =
      df.select(col("source"), hll_sketch_estimate(col("sketch")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val f1 = est(fold(shards))
    // a FIXED ingest order replays to the identical table (what a
    // micro-batch retry needs); different orders only agree within the
    // band (asserted below) — DataSketches' estimator selection is
    // union-history-dependent, so cross-order bit-equality is NOT the
    // HLL contract (unlike the integer quantile sketch's)
    assert(f1 == est(fold(shards)),
      "replaying the same ingest order must rebuild the identical table")
    // and every ingest order stays inside the lgK error band of truth
    val exact = all.map(h => (h.source, h.url)).distinct
      .groupBy(_._1).view.mapValues(_.size).toMap
    Seq(f1, est(fold(shards.reverse))).foreach(_.foreach { case (s, e) =>
      assert(math.abs(e - exact(s)).toDouble / exact(s) < 0.05,
        s"folded estimate $e too far from exact ${exact(s)} for $s")
    })
  }
}
