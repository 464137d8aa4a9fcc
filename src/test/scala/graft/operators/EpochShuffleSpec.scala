package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.epochShuffle]] — the deterministic multi-epoch trainer
  * shuffle: per-epoch permutations must be complete, contiguous per
  * shard, replay-identical, and genuinely different across epochs. */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(5000).select(col("id").as("doc_id"))
  private def shuffled = Sampling.epochShuffle(docs, "doc_id",
    epochs = 3, nShards = 8, salt = "t")

  test("every (epoch, doc) appears exactly once; pos is contiguous per shard") {
    val out = shuffled.cache()
    try {
      assert(out.count() == 3 * 5000)
      assert(out.select("epoch", "doc_id").distinct().count() == 3 * 5000)
      // pos must be exactly 1..count within each (epoch, shard)
      val bad = out.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          count_distinct(col("pos")).as("d"))
        .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("d") =!= col("n"))
      assert(bad.count() == 0)
    } finally out.unpersist()
  }

  test("epochs are different permutations; replays are identical") {
    val byEpoch = shuffled.select("epoch", "doc_id", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> (r._3, r._4)).toMap)
    assert(byEpoch(0L) != byEpoch(1L) && byEpoch(1L) != byEpoch(2L))
    val replay = shuffled.select("epoch", "doc_id", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(replay == byEpoch.toSeq.flatMap { case (e, m) =>
      m.toSeq.map { case (d, (s, p)) => (e, d, s, p) } }.sorted)
  }

  test("shards are balanced (hash uniformity, loose bound)") {
    val sizes = shuffled.filter(col("epoch") === 0)
      .groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length == 8)
    val mean = 5000.0 / 8
    assert(sizes.forall(s => math.abs(s - mean) < mean * 0.25),
      s"shard sizes too skewed: ${sizes.mkString(",")}")
  }

  test("grown corpus preserves existing keys (incremental-ingest property)") {
    val small = Sampling.epochShuffle(docs.filter(col("doc_id") < 1000),
      "doc_id", epochs = 1, nShards = 8, salt = "t")
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val big = shuffled.filter(col("epoch") === 0 && col("doc_id") < 1000)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(small == big, "shard assignment must not depend on corpus size")
  }
}
