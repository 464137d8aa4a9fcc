package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.SparkSpec

/** Advanced Structured Streaming semantics beyond the engine lifecycle:
  * stream–stream interval joins under watermarks and custom keyed state
  * via mapGroupsWithState (the KeyValueGroupedDataset path the build brief
  * names for custom state).
  */
class StatefulStreamingSpec extends SparkSpec {

  test("stream-stream inner join with watermarks + time-range condition (ST5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(Long, Timestamp)]
    val imps = MemoryStream[(Long, Timestamp)]

    val clicksDf = clicks.toDF().toDF("ad_id", "click_time")
      .withWatermark("click_time", "10 seconds")
    val impsDf = imps.toDF().toDF("ad_id_i", "imp_time")
      .withWatermark("imp_time", "10 seconds")

    // click joins an impression of the same ad within [imp, imp+5s]
    val joined = impsDf.join(clicksDf,
      expr("""ad_id = ad_id_i AND
              click_time >= imp_time AND
              click_time <= imp_time + interval 5 seconds"""))

    val q = joined.select("ad_id", "imp_time", "click_time")
      .writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
      imps.addData((1L, ts(0)), (2L, ts(1)))
      clicks.addData((1L, ts(3)), (2L, ts(20))) // 2L outside the 5s window
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad_id FROM ss_join").collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L))
    } finally q.stop()
  }

  test("Misra-Gries summary as streaming state: guarantee holds across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the MG buffer lives in the state store between triggers, so this
    // exercises the kryo buffer round-trip + merge path the batch gate
    // never serializes mid-stream
    val k = 8
    val input = MemoryStream[String]
    val q = input.toDS()
      .select(graft.operators.HeavyHitters.misraGries(k).name("mg"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      val batches = Seq(
        (1 to 40).map(_ => "the quick brown fox") ++ (1 to 30).map(i => s"rare$i token$i"),
        (1 to 40).map(_ => "the lazy dog") ++ (1 to 30).map(i => s"tail$i bits$i"),
        (1 to 20).map(_ => "the end"))
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // the typed agg's product output flattens into top-level columns
      val row = spark.table("mg_stream").collect().head
      val candidates = row.getSeq[String](row.fieldIndex("candidates")).toSet
      val n = row.getLong(row.fieldIndex("n"))
      val allToks = batches.flatten.flatMap(_.split(" ", -1))
      assert(n == allToks.size)
      val exact = allToks.groupBy(identity).view.mapValues(_.size).toMap
      val heavy = exact.collect {
        case (t, c) if c.toLong * (k + 1) > allToks.size => t
      }.toSet
      assert(heavy.nonEmpty && heavy.subsetOf(candidates),
        s"streaming MG lost ${heavy -- candidates}")
      assert(candidates.size <= k)
    } finally q.stop()
  }

  test("custom keyed state via mapGroupsWithState: running per-key max with update stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(String, Long)]
    val result = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, Long)] {
        (key: String, values: Iterator[(String, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(Long.MinValue)
          val m = math.max(prev, values.map(_._2).max)
          state.update(m)
          (key, m)
      }

    val q = result.toDF("k", "running_max")
      .writeStream.format("memory").queryName("mgws").outputMode("update").start()
    try {
      input.addData(("a", 3L), ("a", 7L), ("b", 1L))
      q.processAllAvailable()
      input.addData(("a", 5L), ("b", 9L)) // a's max stays 7; b rises to 9
      q.processAllAvailable()
      val last = spark.sql("SELECT k, running_max FROM mgws").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last == Map("a" -> 7L, "b" -> 9L))
    } finally q.stop()
  }

  /** ST6 under failure (round-4 verdict item #3): the change-stream ingest
    * path (foreachBatch → Engine.appendRows, the production sink) killed
    * by a REAL mid-stream failure — the sink throws AFTER its side effect
    * lands but BEFORE the offset commits, the query dies, and a restart
    * from the same checkpoint replays the failed batch (foreachBatch's
    * documented at-least-once contract). The replayed rows land twice in
    * raw storage with a later epoch; the PK compaction fold must absorb
    * the duplication so the compacted stream still equals the hand-folded
    * result — the property that makes the upsert sink restart-safe. */
  test("change-stream ingest crash: checkpoint restart replays the failed batch; PK fold absorbs it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.Engine
    import graft.schema.StreamSchema
    import org.apache.spark.sql.types.StructType

    val engine = new Engine(spark, tmpDir("graft-crash-ingest"))
    engine.createStream("s", StreamSchema.fromStruct(
      new StructType().add("k", "long", nullable = false).add("v", "string"),
      primaryKey = Seq("k")))
    val ckpt = tmpDir("graft-crash-ckpt")
    val src = MemoryStream[(Long, String)]
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = src.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        engine.appendRows("s", b) // side effect lands first...
        if (id == 1L && !crashed.getAndSet(true))
          // ...then the "process dies" before the offset commit
          sys.error("injected crash after side effect, before commit")
        ()
      }
      .start()

    val q1 = start()
    src.addData((1L, "v1"), (2L, "v2")) // batch 0: commits cleanly
    q1.processAllAvailable()
    src.addData((2L, "v2b"), (3L, "v3")) // batch 1: dies mid-sink
    try { q1.processAllAvailable(); q1.awaitTermination(30000); () }
    catch { case _: Exception => () }
    assert(q1.exception.isDefined, "injected crash did not kill the query")

    val q2 = start() // restart from the same checkpoint
    src.addData((4L, "v4")) // post-recovery traffic
    q2.processAllAvailable()
    q2.stop()

    // the failed batch REPLAYED: its rows are stored twice (two epochs)
    val raw = engine.readStream("s", compact = false)
    assert(raw.filter(col("k") === 3L).count() == 2,
      "batch 1 was not replayed — the crash test lost its teeth")
    // ...and the compacted read still equals the hand-folded answer
    val got = engine.readStream("s").as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "v1"), (2L, "v2b"), (3L, "v3"), (4L, "v4")))
  }

  test("streaming dropDuplicates with watermark (exact streaming dedup)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("id")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
      input.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)))
      q.processAllAvailable()
      input.addData((1L, ts(3)), (3L, ts(4)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM sdedup").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
