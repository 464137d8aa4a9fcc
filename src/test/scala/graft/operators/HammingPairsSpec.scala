package graft.operators

import graft.SparkSpec

/** Generic Hamming-LSH banding vs brute force, fuzzed — including
  * maxHamming = 10, which flips the operator into the e = 1 wide-band
  * probing regime (bands would otherwise drop under 8 bits), a path the
  * hash-gated simhash corpus exercises but fixed fixtures did not. */
class HammingPairsSpec extends SparkSpec {
  import spark.implicits._

  private def fuzzHashes(seed: Long, n: Int): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    // random 56-bit hashes plus planted near-clusters: for every 10th
    // base hash, derivatives at hamming 1..12
    val bases = Seq.fill(n)(r.nextLong() & ((1L << 56) - 1))
    val planted = bases.zipWithIndex.collect { case (h, i) if i % 10 == 0 =>
      (1 to 1 + i % 12).scanLeft(h)((acc, _) =>
        acc ^ (1L << r.nextInt(56))).drop(1)
    }.flatten
    (bases ++ planted).zipWithIndex.map { case (h, i) => (i.toLong, h) }
  }

  private def brute(hs: Seq[(Long, Long)], maxH: Int) =
    (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxH
    } yield (a, b, d.toLong)).toSet

  test("banding == brute force at maxHamming 0, 3 (e=0) and 10 (e=1)") {
    val hs = fuzzHashes(seed = 42, n = 150)
    val df = hs.toDF("id", "h")
    for (maxH <- Seq(0, 3, 10)) {
      val got = Dedup.hammingPairs(df, "id", "h", 56, maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = brute(hs, maxH)
      assert(got == want,
        s"maxH=$maxH: banding diverged (got ${got.size}, want ${want.size})")
      assert(maxH == 0 || want.nonEmpty, s"maxH=$maxH fixture has no pairs")
    }
  }

  test("queryPred bounds the probe side without losing in-scope pairs") {
    import org.apache.spark.sql.functions._
    val hs = fuzzHashes(seed = 7, n = 120)
    val df = hs.toDF("id", "h")
    val got = Dedup.hammingPairs(df, "id", "h", 56, maxHamming = 4,
        queryPred = col("id") % 3 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute(hs, 4).collect {
      case (a, b, _) if a % 3 == 0 => (a, b) }
    assert(got == want.toSet, "probe-bounded pairs diverged")
  }
}
