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

  test("overlap estimate: inclusion-exclusion lands in band; disjoint ~0") {
    // A = [0, 30k), B = [20k, 50k) → overlap 10k, union 50k (20%)
    val a = spark.range(30000).select(lit("g").as("g"), col("id").as("v"))
    val b = spark.range(20000, 50000).select(lit("g").as("g"), col("id").as("v"))
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketches.distinctSketch(df, Seq("g"), "v")
    val r = Sketches.overlapEstimate(sk(a), sk(b), Seq("g"))
      .select("est_overlap", "est_union").collect().head
    assert(math.abs(r.getLong(0) - 10000).toDouble / r.getLong(1) < 0.05,
      s"overlap ${r.getLong(0)} too far from 10000 (union ${r.getLong(1)})")

    // disjoint sets: estimate clamps to ~0 relative to the union
    val c = spark.range(100000, 130000).select(lit("g").as("g"), col("id").as("v"))
    val d = Sketches.overlapEstimate(sk(a), sk(c), Seq("g"))
      .select("est_overlap", "est_union").collect().head
    assert(d.getLong(0).toDouble / d.getLong(1) < 0.05,
      s"disjoint overlap estimate ${d.getLong(0)} not near zero")
  }

  test("sketch KS distance: 0 for identical, ~1 for disjoint, one-sided omitted") {
    val same = spark.range(2000).select(lit("g").as("g"), (col("id") % 97).as("v"))
    val skSame = Sketches.quantileSketch(same, Seq("g"), "v")
    val ks0 = Sketches.sketchKsDistance(skSame, skSame, Seq("g"))
      .select("ks").as[Double].head()
    assert(ks0 == 0.0, s"identical sketches must have ks 0, got $ks0")

    // disjoint value ranges: every bucket boundary separates fully
    val lo = spark.range(1000).select(lit("g").as("g"), (col("id") % 8).as("v"))
    val hi = spark.range(1000).select(lit("g").as("g"),
      (col("id") % 8 + 100000).as("v"))
    val ks1 = Sketches.sketchKsDistance(
      Sketches.quantileSketch(lo, Seq("g"), "v"),
      Sketches.quantileSketch(hi, Seq("g"), "v"), Seq("g"))
      .select("ks").as[Double].head()
    assert(ks1 == 1.0, s"disjoint distributions must have ks 1, got $ks1")

    // a group on one side only has no two-sample statistic
    val extra = spark.range(10).select(lit("only_a").as("g"), col("id").as("v"))
    val out = Sketches.sketchKsDistance(
      Sketches.quantileSketch(same.unionByName(extra), Seq("g"), "v"),
      skSame, Seq("g")).select("g").as[String].collect().toSet
    assert(out == Set("g"), s"one-sided group leaked: $out")
  }

  test("sketch KS tracks a real location shift within bucket resolution") {
    // shifted lognormal-ish integers: the sketch statistic must land
    // within the bucket-resolution band of the exact two-sample KS
    def vals(shift: Double) = spark.range(4000).select(lit("g").as("g"),
      (exp(randn(seed = 7) * 0.5 + 5.0 + shift)).cast("long").as("v"))
    val a = vals(0.0); val b = vals(0.35)
    val sk = Sketches.sketchKsDistance(
      Sketches.quantileSketch(a, Seq("g"), "v"),
      Sketches.quantileSketch(b, Seq("g"), "v"), Seq("g"))
      .select("ks").as[Double].head()
    // exact KS over raw values
    import org.apache.spark.sql.expressions.Window
    val tagged = a.withColumn("s", lit(0)).unionByName(b.withColumn("s", lit(1)))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ex = tagged
      .withColumn("ca", sum(when(col("s") === 0, 1L).otherwise(0L)).over(w))
      .withColumn("cb", sum(when(col("s") === 1, 1L).otherwise(0L)).over(w))
      .agg(max(abs(col("ca") - col("cb")))).as[Long].head() / 4000.0
    assert(sk > 0.05, s"a 0.35-sigma shift must register, got $sk")
    assert(math.abs(sk - ex) < 0.1,
      s"sketch ks $sk too far from exact ks $ex (bucket resolution band)")
  }

  test("cm join size: matches a driver-side hash replay and never under-counts") {
    val aKeys = (0 until 300).map(i => i.toLong % 50)          // 50 keys, skewed
    val bKeys = (0 until 400).map(i => (i.toLong % 70) + 25L)  // 70 keys, overlap 25..49
    val (depth, width, salt) = (3, 256, "js")
    val a = aKeys.toDF("k")
    val b = bKeys.toDF("k")
    val est = Sketches.cmJoinSizeEstimate(
      Sketches.countMinSketch(a, Nil, "k", depth, width, salt),
      Sketches.countMinSketch(b, Nil, "k", depth, width, salt))
      .select(col("join_size_est").cast("long")).as[Long].head()
    // exact join size
    val exact = aKeys.groupBy(identity).map { case (k, g) =>
      g.size.toLong * bKeys.count(_ == k)
    }.sum
    assert(est >= exact, s"CM join size under-counted: $est < $exact")
    // exact replay of the estimate: same salted hash, same slots
    def slot(r: Int, k: Long): Long = {
      val h = CrossHash.scalaHash56(s"$salt:$r:$k")
      ((h % width) + width) % width
    }
    val replay = (0 until depth).map { r =>
      val ca = aKeys.groupBy(slot(r, _)).map { case (s, g) => s -> g.size.toLong }
      val cb = bKeys.groupBy(slot(r, _)).map { case (s, g) => s -> g.size.toLong }
      ca.map { case (s, n) => n * cb.getOrElse(s, 0L) }.sum
    }.min
    assert(est == replay, s"estimate $est != hash replay $replay")
  }

  test("sketch W1: 0 for identical; equals the hand EMD on a 2-bucket split") {
    val same = spark.range(2000).select(lit("g").as("g"), (col("id") % 97).as("v"))
    val skSame = Sketches.quantileSketch(same, Seq("g"), "v")
    val w0 = Sketches.sketchW1Distance(skSame, skSame, Seq("g"))
      .select("emd_micro").as[Long].head()
    assert(w0 == 0L, s"identical sketches must have W1 0, got $w0")

    // two exact buckets (v=1 and v=2 land in distinct exact buckets):
    // a = 3×v1 + 1×v2, b = 1×v1 + 3×v2 → union support = 2 buckets,
    // only the first prefix gap counts: |3·4 − 1·4| = 8; n_a·n_b = 16
    // → W1 = 8/16 = 0.5 → 500000 micros
    val a = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L)).toDF("g", "v")
    val b = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 2L)).toDF("g", "v")
    val w = Sketches.sketchW1Distance(
      Sketches.quantileSketch(a, Seq("g"), "v"),
      Sketches.quantileSketch(b, Seq("g"), "v"), Seq("g"))
      .select("emd_micro").as[Long].head()
    assert(w == 500000L, s"hand EMD is 0.5, got $w micros")
  }

  test("sketch W1 sees tail mass that KS caps: floor division pinned") {
    // a: all at v=1; b: half at v=1, half spread FAR into the tail over
    // many buckets — KS is 0.5 regardless of distance, W1 grows with it
    val a = spark.range(1200).select(lit("g").as("g"), lit(1L).as("v"))
    val bNear = spark.range(600).select(lit("g").as("g"), lit(1L).as("v"))
    val bFar = spark.range(600).select(lit("g").as("g"),
      (col("id") * 1000 + 100000).as("v"))
    val b = bNear.unionByName(bFar)
    val ks = Sketches.sketchKsDistance(
      Sketches.quantileSketch(a, Seq("g"), "v"),
      Sketches.quantileSketch(b, Seq("g"), "v"), Seq("g"))
      .select("ks").as[Double].head()
    val w1 = Sketches.sketchW1Distance(
      Sketches.quantileSketch(a, Seq("g"), "v"),
      Sketches.quantileSketch(b, Seq("g"), "v"), Seq("g"))
      .select("emd_micro").as[Long].head()
    assert(ks == 0.5, s"KS saturates at the mass gap, got $ks")
    // W1 in bucket steps: half the mass moves across the whole union
    // support — far larger than the 0.5-step KS-equivalent move
    assert(w1 > 10 * 500000L,
      s"W1 must scale with tail distance (got $w1 micros)")
    // exact floor: replay the integer definition on the aligned buckets
    val al = Sketches.quantileSketch(a, Seq("g"), "v")
      .select(col("msb"), col("mant"), col("cnt").as("cnt_a"))
      .join(Sketches.quantileSketch(b, Seq("g"), "v")
        .select(col("msb"), col("mant"), col("cnt").as("cnt_b")),
        Seq("msb", "mant"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .orderBy("msb", "mant")
      .select("cnt_a", "cnt_b").as[(Long, Long)].collect()
    val (na, nb) = (al.map(_._1).sum, al.map(_._2).sum)
    var (ca, cb, num) = (0L, 0L, BigInt(0))
    al.foreach { case (x, y) =>
      ca += x; cb += y; num += (BigInt(ca) * nb - BigInt(cb) * na).abs
    }
    assert(w1 == (num * 1000000 / (BigInt(na) * nb)).toLong,
      "emd_micro must equal the exact integer floor")
  }
}
