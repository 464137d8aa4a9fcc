package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** [[StreamingHeavyHitters]] — the continuous Misra-Gries monitor.
  * Asserts the guarantees the operator's 100 TB shape rests on: bounded
  * per-bucket state, cross-micro-batch accumulation, the MG lower
  * bound, and the global superset guarantee (every token over the
  * N/(k+1) bar survives its bucket's sketch). */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val BUCKETS = 4

  /** Latest complete emission per bucket: a bucket's final trigger
    * re-emits ALL its counters with its then-current token total, so
    * rows at the bucket's max bucket_n are its final counter set. */
  private def finalState(table: String): Seq[(Int, String, Long, Long)] = {
    val rows = spark.table(table)
      .as[(Int, String, Long, Long)].collect().toSeq
    val lastN = rows.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._4).max }
    rows.filter(r => r._4 == lastN(r._1))
  }

  test("accumulates across micro-batches with bounded per-bucket state") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val q = StreamingHeavyHitters.track(src.toDS().toDF("text"), "text",
        k = K, buckets = BUCKETS)
      .writeStream.format("memory").queryName("shh1")
      .outputMode("update").start()
    val batches = Seq(
      Seq("hh hh hh aa bb", "hh hh cc dd"),
      Seq("hh hh hh ee ff aa", "gg hh hh"),
      Seq("hh hh hh hh ii jj", "kk ll aa"))
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      val fin = finalState("shh1")
      // bounded state: no bucket tracks more than k counters
      fin.groupBy(_._1).foreach { case (b, rs) =>
        assert(rs.size <= K, s"bucket $b tracks ${rs.size} > $K counters")
      }
      val allToks = batches.flatten.flatMap(_.split(" ", -1))
      val trueCnt = allToks.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
      // MG lower bound: tracked count never exceeds the true count
      fin.foreach { case (_, t, lb, _) =>
        assert(lb <= trueCnt(t), s"$t: lower bound $lb > true ${trueCnt(t)}")
      }
      // bucket totals sum to the exact global token count
      assert(fin.map(r => (r._1, r._4)).distinct.map(_._2).sum == allToks.size)
      // superset guarantee: every token over the global N/(k+1) bar is
      // tracked ("hh" is 13 of 27 tokens, far over 27/5)
      val n = allToks.size.toLong
      val mustSurvive = trueCnt.filter { case (_, c) => c * (K + 1) > n }.keySet
      assert(mustSurvive.contains("hh"), "test data lost its heavy hitter")
      val tracked = fin.map(_._2).toSet
      assert(mustSurvive.subsetOf(tracked),
        s"missing heavy hitters: ${mustSurvive.diff(tracked)}")
      // no eviction pressure ever hit hh's bucket in this tiny stream?
      // not guaranteed — but the lower bound must still be positive
      assert(fin.filter(_._2 == "hh").map(_._3).max > 0)
    } finally q.stop()
  }

  test("a heavy hitter emerging late is caught (the monitor use-case)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val q = StreamingHeavyHitters.track(src.toDS().toDF("text"), "text",
        k = K, buckets = BUCKETS)
      .writeStream.format("memory").queryName("shh2")
      .outputMode("update").start()
    try {
      src.addData("aa bb cc dd ee ff gg")
      q.processAllAvailable()
      val before = finalState("shh2").map(_._2).toSet
      assert(!before.contains("zz"))
      // the template-spam burst
      src.addData("zz zz zz zz zz zz zz zz")
      q.processAllAvailable()
      val after = finalState("shh2")
      val zz = after.filter(_._2 == "zz")
      assert(zz.nonEmpty, "burst token not tracked after its batch")
      assert(zz.head._3 >= 8 - 15 / (K + 1), "burst mass lost") // MG bound
    } finally q.stop()
  }
}
