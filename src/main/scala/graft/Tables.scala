package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (/root/repo/TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS) which Spark can
  * only read via `spark.sql.legacy.parquet.nanosAsLong` (as a bigint of epoch
  * nanos); [[events]] exposes it that way plus a derived micro-precision
  * `event_time` column, which matches DuckDB's `CAST(ts AS TIMESTAMP)`
  * (both truncate ns -> us).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** When set, [[load]] returns an incremental `readStream` frame instead
    * of a batch scan — the hook [[graft.streaming.StreamingParity]] uses
    * to replay the VERY SAME gate code as a Structured Streaming plan
    * (batch≡streaming differential testing). Thread-scoped so concurrent
    * specs can't leak the mode into each other. */
  private[graft] val streamingReads = new scala.util.DynamicVariable[Boolean](false)

  def withStreamingReads[T](body: => T): T =
    streamingReads.withValue(true)(body)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (streamingReads.value) {
      // file streaming source needs an explicit schema: probe it with a
      // footer-only batch read (no data scan). The testdata tables are
      // single .parquet FILES: FileStreamSource force-sets basePath to
      // the path itself UNLESS the path is a glob (then it honors the
      // user option) — so phrase the path as a brace-glob matching only
      // this file and pass the parent directory explicitly.
      val schema = spark.read.parquet(path(dir, name)).schema
      spark.readStream.schema(schema).option("basePath", dir)
        .parquet(s"$dir/$name.{parquet}")
    } else spark.read.parquet(path(dir, name))
  }

  /** events with `ts` = epoch nanos (bigint) and `event_time` = timestamp(us). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
