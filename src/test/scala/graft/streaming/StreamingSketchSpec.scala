package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

object StreamingSketchSpec {
  case class Doc(lang: String, len: Long)
}

/** Ingest-time sketch-rollup maintenance: a quantile-sketch table kept
  * up to date per micro-batch via `foreachBatch` +
  * [[Sketches.updateQuantileSketch]] must equal the one-shot batch
  * sketch over the same rows — the "persist the sketch at ingest, never
  * rescan the corpus" deployment, proven as a streaming differential. */
class StreamingSketchSpec extends SparkSpec {
  import StreamingSketchSpec.Doc

  test("foreachBatch-maintained sketch table == one-shot batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("sketch-stream")
    val all = (1L to 3000L).map(i =>
      Doc(if (i % 3 == 0) "de" else "en", (i * i) % 100000 + 1))

    val src = MemoryStream[Doc]
    val q = src.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // shard-vs-index fold: read the standing sketch (if any), merge
        // the micro-batch's sketch, overwrite — O(batch)+O(sketch) work
        val standing =
          if (new java.io.File(s"$dir/sketch").exists())
            spark.read.parquet(s"$dir/sketch")
          else batch.sparkSession.emptyDataFrame
            .select(lit("").as("lang"), lit(0).as("msb"),
              lit(0L).as("mant"), lit(0L).as("cnt")).limit(0)
        val updated = Sketches.updateQuantileSketch(
          standing, batch, Seq("lang"), "len")
        // stage-then-swap so the read above never races the write
        updated.write.mode("overwrite").parquet(s"$dir/next")
        spark.read.parquet(s"$dir/next").write.mode("overwrite")
          .parquet(s"$dir/sketch")
        ()
      }
      .start()
    try {
      all.grouped(700).foreach { chunk =>
        src.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/sketch")
    val batchSketch = Sketches.quantileSketch(
      all.toDF("lang", "len"), Seq("lang"), "len")
    assert(streamed.collect().map(_.toString).sorted.toSeq ==
      batchSketch.collect().map(_.toString).sorted.toSeq,
      "micro-batch-maintained sketch must equal the one-shot sketch")

    // and the answers agree too (same table ⇒ same folds)
    val a = Sketches.sketchQuantiles(streamed, Seq("lang"), Seq(0.5, 0.99))
      .collect().map(_.toString).sorted.toSeq
    val b = Sketches.sketchQuantiles(batchSketch, Seq("lang"), Seq(0.5, 0.99))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("updateQuantileSketch folds shards to the whole-corpus table (order independent)") {
    import spark.implicits._
    val all = (1L to 5000L).map(i => Doc(if (i % 2 == 0) "a" else "b",
      (i * 2654435761L) % (1L << 30) + 1))
    val whole = Sketches.quantileSketch(all.toDF("lang", "len"), Seq("lang"), "len")
    def fold(order: Seq[Seq[Doc]]) = order.foldLeft(
      whole.limit(0).select("lang", "msb", "mant", "cnt")) {
      (standing, shard) =>
        Sketches.updateQuantileSketch(standing, shard.toDF("lang", "len"),
          Seq("lang"), "len")
    }
    val shards = all.grouped(1300).toSeq
    val f1 = fold(shards).collect().map(_.toString).sorted.toSeq
    val f2 = fold(shards.reverse).collect().map(_.toString).sorted.toSeq
    val w = whole.collect().map(_.toString).sorted.toSeq
    assert(f1 == w && f2 == w)
  }
}
