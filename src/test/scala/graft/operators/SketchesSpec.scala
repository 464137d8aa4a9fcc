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

  // ------------------------------------------------------------------
  // Log-linear quantile sketch (round 6)
  // ------------------------------------------------------------------

  /** Heavy-tailed positive longs + the v=0 edge, two groups. */
  private def qvals = spark.range(30000).select(
    (col("id") % 2).cast("string").as("g"),
    when(col("id") % 997 === 0, lit(0L)) // exercise the zero bucket
      .otherwise(pmod(xxhash64(col("id")), lit(1L << 40)) + 1).as("v"))

  test("quantile sketch: sum of shard sketches == whole-corpus sketch (merge law)") {
    val whole = Sketches.quantileSketch(qvals, Seq("g"), "v")
    val sharded = qvals.withColumn("shard", pmod(xxhash64(col("v")), lit(5)))
    val viaShards = Sketches.mergeQuantileSketch(
      Sketches.quantileSketch(sharded, Seq("g", "shard"), "v"), Seq("g"))
    val a = whole.collect().map(_.toString).sorted.toSeq
    val b = viaShards.collect().map(_.toString).sorted.toSeq
    assert(a == b, "bucket-count merge must be partition independent")
  }

  test("quantile sketch: estimates within the analytic relative-error bound") {
    import spark.implicits._
    val m = 4
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99)
    val est = Sketches.sketchQuantiles(
      Sketches.quantileSketch(qvals, Seq("g"), "v", m), Seq("g"), qs, m)
      .select("g", "q", "est").as[(String, Double, Double)].collect()
    // exact rank quantile with the same ceil(q·N) pick rule
    val exact = qvals.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        g -> qs.map(q =>
          q -> sorted(math.ceil(q * sorted.length).toInt - 1)).toMap
      }
    val tol = 1.0 / (1 << (m + 1)) // half bucket width / lower bound
    for ((g, q, e) <- est) {
      val x = exact(g)(q).toDouble
      assert(math.abs(e - x) <= tol * math.max(x, 1.0) + 0.5,
        s"g=$g q=$q est=$e exact=$x beyond ${tol}")
    }
  }

  test("quantile sketch: bucket count is bounded regardless of corpus size") {
    val m = 4
    val perGroup = Sketches.quantileSketch(qvals, Seq("g"), "v", m)
      .groupBy("g").count().select("count").collect().map(_.getLong(0))
    // ≤ 64 msb values × 2^m mantissas + zero bucket
    assert(perGroup.forall(_ <= 64L * (1 << m) + 1))
    // and 10× the rows cannot widen it (same value domain → same buckets)
    val wide = Sketches.quantileSketch(
      qvals.unionAll(qvals).unionAll(qvals), Seq("g"), "v", m)
      .groupBy("g").count().select("count").collect().map(_.getLong(0))
    assert(wide.toSeq.sorted == perGroup.toSeq.sorted)
  }

  test("quantile sketch: v=0 and exact small values land in exact buckets") {
    import spark.implicits._
    val tiny = Seq(("a", 0L), ("a", 0L), ("a", 7L), ("a", 31L))
      .toDF("g", "v")
    val est = Sketches.sketchQuantiles(
      Sketches.quantileSketch(tiny, Seq("g"), "v"), Seq("g"),
      Seq(0.25, 0.75, 1.0))
      .select("q", "est").as[(Double, Double)].collect().toMap
    // values ≤ 2^5-1 sit in single-value buckets → estimates are EXACT
    assert(est(0.25) == 0.0 && est(0.75) == 7.0 && est(1.0) == 31.0)
  }
}
