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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, name))
  }

  /** events with `ts` = epoch nanos (bigint) and `event_time` = timestamp(us). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
