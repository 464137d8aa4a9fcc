package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

object StreamStaticJoinSpec {
  case class Ev(id: Long, nation: Long)
}

/** Stream-static enrichment: a live stream joined to a BATCH dimension
  * table — the "enrich events against a reference table" deployment
  * shape, distinct from both batch joins and stream-stream joins (no
  * watermark, no join state). The contract these tests pin, measured
  * against Spark's actual behavior: the file-backed static side is
  * FROZEN at query start (its listing is captured in the started plan),
  * an in-place dimension overwrite fails the query fast instead of
  * serving stale rows, and the supported live-update recipes are a
  * query restart (cheap under checkpoint resume) or modeling the
  * dimension as a change STREAM (the engine's change-stream
  * compaction path). */
class StreamStaticJoinSpec extends SparkSpec {
  import StreamStaticJoinSpec._

  test("static side is frozen at query start: in-place update fails fast; restart picks it up") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = tmpDir("ss-dim")

    def writeDim(rows: Seq[(Long, String)]): Unit =
      rows.toDF("nation", "label").coalesce(1)
        .write.mode("overwrite").parquet(dimDir)

    def startJoin(src: MemoryStream[Ev], name: String) =
      src.toDF().join(spark.read.parquet(dimDir), Seq("nation"), "left")
        .select($"id", $"label")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()

    writeDim(Seq((0L, "zero-v1"), (1L, "one-v1")))
    val src1 = MemoryStream[Ev]
    val q1 = startJoin(src1, "ss_join_v1")
    try {
      src1.addData(Ev(100, 0)); q1.processAllAvailable()
      assert(spark.table("ss_join_v1").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap === Map(100L -> "zero-v1"))

      // in-place overwrite UNDER the running query: the static side's
      // file listing was captured at query start, so the next batch must
      // FAIL FAST on the deleted part-file — never silently serve stale
      // or mixed rows (refreshByPath cannot reach the captured relation;
      // verified — the listing lives in the started plan, not the catalog)
      writeDim(Seq((0L, "zero-v2"), (1L, "one-v2"), (2L, "two-v2")))
      src1.addData(Ev(101, 0))
      val e = intercept[Exception] { q1.processAllAvailable() }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => t.getMessage != null &&
          t.getMessage.contains("FILE_NOT_EXIST")),
        s"expected fail-fast on updated static side, got: $e")
    } finally q1.stop()

    // the supported live-update recipe at this layer: restart the query
    // (checkpoint resume makes this cheap — StatefulStreamingSpec) — the
    // new plan lists the new files and later events enrich against v2
    val src2 = MemoryStream[Ev]
    val q2 = startJoin(src2, "ss_join_v2")
    try {
      src2.addData(Ev(101, 0), Ev(102, 2)); q2.processAllAvailable()
      val got = spark.table("ss_join_v2")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(101L -> "zero-v2", 102L -> "two-v2"))
    } finally q2.stop()
  }

  test("left join keeps unmatched stream rows (no dimension state retained)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = tmpDir("ss-dim2")
    Seq((0L, "only")).toDF("nation", "label")
      .coalesce(1).write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val src = MemoryStream[Ev]
    val q = src.toDF().join(dim, Seq("nation"), "left")
      .select($"id", $"label")
      .writeStream.format("memory").queryName("ss_left")
      .outputMode("append").start()
    try {
      src.addData(Ev(1, 0), Ev(2, 99)); q.processAllAvailable()
      val got = spark.table("ss_left")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(got === Map(1L -> "only", 2L -> null))
    } finally q.stop()
  }
}
