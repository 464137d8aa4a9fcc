package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sketches]] — the merge laws that make sketch rollup tables safe to
  * persist: shard-union ≡ whole-corpus sketch, coarser rollup ≡ direct
  * sketch at that grain, and the in-plan drift assertion actually fails
  * the job on a lying estimate. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(20000).select(
    (col("id") % 7).cast("string").as("source"),
    (col("id") % 3).cast("string").as("lang"),
    (col("id") % 4831).as("user"))

  test("union of shard sketches == whole-corpus sketch estimate (order independence)") {
    val whole = Sketches.rollup(
      Sketches.distinctSketch(docs, Seq("source"), "user"), Nil)
      .select("estimate").as[Double].head()
    // shard by an unrelated hash, sketch each shard, union
    val sharded = docs.withColumn("shard", pmod(xxhash64(col("user")), lit(4)))
    val viaShards = Sketches.rollup(
      Sketches.distinctSketch(sharded, Seq("shard"), "user"), Nil)
      .select("estimate").as[Double].head()
    assert(whole === viaShards,
      "HLL register merge must be order/partition independent")
  }

  test("rollup from (source, lang) grain to (source) == direct (source) sketches") {
    val fine = Sketches.distinctSketch(docs, Seq("source", "lang"), "user")
    val rolled = Sketches.rollup(fine, Seq("source"))
      .select("source", "estimate").as[(String, Double)].collect().toMap
    val direct = Sketches.distinctSketch(docs, Seq("source"), "user")
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))
      .select("source", "estimate").as[(String, Double)].collect().toMap
    assert(rolled === direct)
  }

  test("estimate lands within 5% of exact on uniform keys") {
    val est = Sketches.rollup(
      Sketches.distinctSketch(docs, Seq("source"), "user"), Nil)
      .select("estimate").as[Double].head()
    assert(math.abs(est - 4831.0) / 4831.0 <= 0.05)
  }

  test("withinTolerance fails the job on drift instead of returning false") {
    val e = intercept[Exception] {
      docs.agg(count_distinct(col("user")).cast("long").as("exact"))
        .select(Sketches.withinTolerance(lit(99999.0), col("exact"), 0.05))
        .collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => t.getMessage != null && t.getMessage.contains("drifted")))
  }
}
