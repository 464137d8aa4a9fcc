package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

object StreamingDriftSpec {
  case class Doc(lang: String, len: Long)
}

/** The ingest-time drift monitor, composed end to end: a standing
  * quantile sketch maintained per micro-batch (foreachBatch +
  * updateQuantileSketch) with every batch ALSO scored against the
  * standing sketch via the two-sample KS distance BEFORE folding it in.
  * In-distribution batches stay under the alert bar; an injected
  * location shift fires it. The monitor reads only sketch tables —
  * O(groups × 1025 rows) per check, the corpus never rescanned. */
class StreamingDriftSpec extends SparkSpec {
  import StreamingDriftSpec.Doc

  test("in-distribution batches stay quiet; an injected shift alerts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("drift-stream")
    def draw(seed: Int, shift: Double, n: Int): Seq[Doc] = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(Doc("en",
        math.exp(r.nextGaussian() * 0.4 + 5.0 + shift).toLong.max(1L)))
    }

    val alerts = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val src = MemoryStream[Doc]
    val q = src.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val shardSketch = Sketches.quantileSketch(batch, Seq("lang"), "len")
        val standingPath = s"$dir/sketch"
        if (new java.io.File(standingPath).exists()) {
          val standing = spark.read.parquet(standingPath)
          // score the incoming shard BEFORE folding it in
          val ks = Sketches.sketchKsDistance(standing, shardSketch,
            Seq("lang")).select("ks").collect().headOption
            .map(_.getDouble(0)).getOrElse(0.0)
          alerts += ((id, ks))
          Sketches.mergeQuantileSketch(
            standing.unionByName(shardSketch), Seq("lang"))
            .write.mode("overwrite").parquet(s"$dir/next")
          spark.read.parquet(s"$dir/next").write.mode("overwrite")
            .parquet(standingPath)
        } else shardSketch.write.mode("overwrite").parquet(standingPath)
        ()
      }.start()
    try {
      // three in-distribution shards, then a shifted one
      Seq(draw(1, 0.0, 1500), draw(2, 0.0, 1500), draw(3, 0.0, 1500),
        draw(4, 0.9, 1500)).foreach { shard =>
        src.addData(shard: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val (quiet, shifted) = (alerts.dropRight(1).map(_._2), alerts.last._2)
    assert(quiet.nonEmpty && quiet.forall(_ < 0.1),
      s"in-distribution shards must stay under the bar: $alerts")
    assert(shifted > 0.3,
      s"the 0.9-sigma shift must fire the monitor: $alerts")
  }
}
