package graft.operators

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries heavy hitters: the sketch guarantee fuzzed against plain
  * Scala exact counts (including across merges, the distributed path),
  * plus the end-to-end operator vs an exact groupBy on skewed data.
  */
class HeavyHittersSpec extends SparkSpec {

  private def exactCounts(toks: Seq[String]): Map[String, Long] =
    toks.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Run the aggregator the way Spark does: partition the stream, reduce
    * each split into its own buffer, then fold the buffers with merge. */
  private def mgCandidates(k: Int, splits: Seq[Seq[String]]): Set[String] = {
    val agg = new HeavyHitters.MisraGries(k)
    val bufs = splits.map(s => s.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)))
    val merged = bufs.reduceLeft(agg.merge)
    agg.finish(merged).candidates.toSet
  }

  test("MG guarantee: every token above N/(k+1) survives, single partition and merged") {
    val rnd = new Random(42)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(12)
      // skewed stream: a few hot tokens + a heavy tail of near-uniques
      val hot = (0 until 1 + rnd.nextInt(4)).map(i => s"hot$i")
      val n = 200 + rnd.nextInt(800)
      val toks = (0 until n).map { _ =>
        if (rnd.nextDouble() < 0.4) hot(rnd.nextInt(hot.size))
        else s"t${rnd.nextInt(200)}"
      }
      val exact = exactCounts(toks.map(t => t + " ").map(_.trim)) // no-op, keep strings
      val heavy = exact.collect {
        case (t, c) if c * (k + 1) > toks.size => t
      }.toSet
      // single buffer
      val single = mgCandidates(k, Seq(toks.map(t => t))
        .map(_.map(identity)))
      assert(heavy.subsetOf(single),
        s"trial $trial (k=$k): single-buffer MG lost ${heavy -- single}")
      // random 2-5 way split + merge (the map-side-combine path)
      val nSplits = 2 + rnd.nextInt(4)
      val splits = toks.grouped(math.max(1, toks.size / nSplits)).toSeq
      val merged = mgCandidates(k, splits)
      assert(heavy.subsetOf(merged),
        s"trial $trial (k=$k, $nSplits splits): merged MG lost ${heavy -- merged}")
      // bounded state
      assert(single.size <= k && merged.size <= k)
    }
  }

  test("reduce tokenizes like split(' ', -1): empties kept, null text skipped") {
    val agg = new HeavyHitters.MisraGries(8)
    val b = agg.reduce(agg.reduce(agg.zero, "a  b "), null)
    // "a  b " → ["a", "", "b", ""] — 4 tokens, empties counted
    assert(b.n == 4)
    assert(agg.finish(b).candidates.toSet == Set("a", "b", ""))
  }

  test("exactHeavyHitters == exact groupBy threshold on skewed data, small k") {
    import spark.implicits._
    val rnd = new Random(7)
    // docs of 10 tokens from a zipf-ish pool; k=8 forces heavy truncation
    val docs = (0 until 300).map { _ =>
      (0 until 10).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.35) "the" else if (r < 0.5) "of"
        else if (r < 0.6) "and" else s"w${rnd.nextInt(500)}"
      }.mkString(" ")
    }.toDF("text")
    val k = 8
    val got = HeavyHitters.exactHeavyHitters(docs, "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val want = toks.groupBy("tok").count()
      .filter(col("count") * (k + 1) > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "test data produced no heavy hitters — tighten the skew")
    assert(got == want)
  }

  test("empty / all-null corpora yield empty results, not errors") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("text")
    assert(HeavyHitters.exactHeavyHitters(empty, "text", 4).count() == 0)
    val nulls = Seq[Option[String]](None, None).toDF("text")
    assert(HeavyHitters.exactHeavyHitters(nulls, "text", 4).count() == 0)
  }
}
