package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed Bloom filter's contracts: zero false negatives (the
  * property that makes [[Bloom.newRowsVia]] exact), a false-positive
  * rate near the analytic expectation, build determinism under
  * repartitioning, and prefilter+confirm ≡ plain anti-join on data with
  * real overlap, null keys, and duplicate shard keys. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = 32

  test("no false negatives: every inserted key probes true") {
    val keys = (1 to 5000).map(i => s"key_$i").toDF("k")
    val f = Bloom.buildFilter(keys, "k", buckets)
    val misses = keys
      .withColumn("__bkt", Bloom.bucketOf(col("k"), buckets))
      .join(f.select(col("bucket").as("__bkt"), col("bits")), Seq("__bkt"))
      .filter(!Bloom.mightContain(col("k"), col("bits")))
      .count()
    assert(misses == 0, s"$misses false negatives — Bloom contract broken")
  }

  test("false-positive rate is near the analytic expectation") {
    val n = 20000
    val inserted = (1 to n).map(i => s"in_$i").toDF("k")
    val f = Bloom.buildFilter(inserted, "k", buckets)
    val fresh = (1 to n).map(i => s"out_$i").toDF("k")
    val fp = fresh
      .withColumn("__bkt", Bloom.bucketOf(col("k"), buckets))
      .join(f.select(col("bucket").as("__bkt"), col("bits")), Seq("__bkt"))
      .filter(Bloom.mightContain(col("k"), col("bits")))
      .count()
    // m = 32·8192 bits, n = 20k, k = 5 → p ≈ (1 - e^(-kn/m))^k ≈ 0.003
    val rate = fp.toDouble / n
    assert(rate < 0.05, s"fp rate $rate too high for the sized filter")
  }

  test("build is deterministic under any partitioning") {
    val keys = (1 to 3000).map(i => s"key_$i").toDF("k")
    def bits(df: org.apache.spark.sql.DataFrame) =
      Bloom.buildFilter(df, "k", buckets)
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(bits(keys.repartition(1)).sameElements(bits(keys.repartition(7))),
      "bit_or build must be partitioning-independent")
  }

  test("fuzz: no false negatives and anti-join parity on adversarial keys") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // unicode, empty strings, whitespace, very long keys, duplicates
    val weird: Gen[String] = Gen.frequency(
      (3, Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '),
        Gen.choose('α', 'ω'), Gen.choose('一', '十'))).map(_.mkString)),
      (1, Gen.const("")),
      (1, Gen.alphaNumStr.map(s => s * 50)))
    def draw(seedBase: Int, n: Int): Seq[String] =
      (0 until n).map(i =>
        weird.pureApply(Gen.Parameters.default, Seed(seedBase * 10000L + i)))

    val standingKeys = draw(1, 800)
    val standing = standingKeys.toDF("key")
    val f = Bloom.buildFilter(standing, "key", buckets)
    // every inserted key (incl. "" and unicode) must probe true
    val misses = standing
      .withColumn("__bkt", Bloom.bucketOf(col("key"), buckets))
      .join(f.select(col("bucket").as("__bkt"), col("bits")), Seq("__bkt"))
      .filter(!Bloom.mightContain(col("key"), col("bits")))
      .count()
    assert(misses == 0, s"$misses fuzz false negatives")

    // shard: a mix of standing keys and fresh draws, with duplicates
    val shard = (draw(2, 400) ++ standingKeys.take(200) ++
      standingKeys.take(50)).zipWithIndex.toDF("key", "row_id")
    val got = Bloom.newRowsVia(f, standing, shard, "key", buckets)
      .collect().map(_.toString).sorted.toSeq
    val want = shard.join(standing.distinct(), Seq("key"), "left_anti")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, "fuzz bloom path diverged from the anti-join")
  }

  test("newRowsVia == plain anti-join (overlap, nulls, dup shard keys)") {
    val standing = ((1 to 800).map(i => s"k${i % 500}") :+ null)
      .toDF("key").withColumn("v", lit("ex"))
    // shard: half overlapping, half new, a null key, and repeated keys
    val shard = ((400 to 700).map(i => s"k$i") ++
      (400 to 700).map(i => s"k$i") :+ null).zipWithIndex
      .toDF("key", "row_id")
    val f = Bloom.buildFilter(standing, "key", buckets)
    val got = Bloom.newRowsVia(f, standing, shard, "key", buckets)
      .collect().map(_.toString).sorted.toSeq
    val want = shard.join(standing.select("key").distinct(),
      Seq("key"), "left_anti")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, s"bloom path diverged from the exact anti-join")
    assert(want.nonEmpty && want.size < shard.count(),
      "fixture must exercise both kept and dropped rows")
  }
}
