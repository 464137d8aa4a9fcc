package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Vocab.vocabCoverage]] — coverage@V against a hand count, V beyond
  * the vocabulary, floor-division boundary, and the bucketed-rank plan
  * shape (no single-partition window over the type table). */
class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("coverage@V matches a hand count with desc-count word tie-break") {
    // counts: the=5, cat=3, dog=3, sat=1  (total 12)
    // rank order: the, cat, dog, sat (cat < dog lexically at tied 3)
    val docs = Seq(
      "the cat sat", "the cat dog", "the cat dog",
      "the dog", "the").toDF("text")
    val got = Vocab.vocabCoverage(docs, sizes = Seq(1L, 2L, 3L, 10L))
      .orderBy("v")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 12L, 416666L),   // 5e6/12 floors to 416666
      (2L, 8L, 12L, 666666L),
      (3L, 11L, 12L, 916666L),
      (10L, 12L, 12L, 1000000L)))
  }

  test("null and empty text contribute nothing") {
    val docs = Seq(Some("a a b"), None, Some("")).toDF("text")
    val got = Vocab.vocabCoverage(docs, sizes = Seq(1L))
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((1L, 2L, 3L, 666666L)))
  }

  test("shardNovelty: first shard claims shared grams; later shards only their own") {
    // shard = doc_id % 2. 3-grams:
    //   doc 0 (shard 0): "a b c d" → {a b c, b c d}
    //   doc 2 (shard 0): "a b c"   → {a b c}        (dup within shard)
    //   doc 1 (shard 1): "a b c x" → {a b c, b c x} (a b c seen in shard 0)
    val docs = Seq((0L, "a b c d"), (2L, "a b c"), (1L, "a b c x"))
      .toDF("doc_id", "text")
    val got = Vocab.shardNovelty(docs, nShards = 2, n = 3)
      .orderBy("shard")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1000000L),   // {a b c, b c d} both first here
      (1L, 2L, 1L, 500000L)))   // b c x new; a b c not
  }

  test("shardNovelty: short docs contribute nothing; single shard is 100% new") {
    val docs = Seq((0L, "x y"), (1L, "p q r")).toDF("doc_id", "text")
    val got = Vocab.shardNovelty(docs, nShards = 1, n = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 1000000L)))
  }

  test("plan: the type-table rank has no single-partition corpus window") {
    val docs = (0 until 500).map(i => s"w${i % 37} w${i % 11} common")
      .toDF("text")
    val df = Vocab.vocabCoverage(docs, sizes = Seq(5L))
    // the bucketed rank partitions its window by __graft_bkt; the only
    // unpartitioned window is the <= buckets-row offset frame
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_bkt"),
      s"expected the bucketed two-pass rank in:\n$plan")
    df.collect() // and it runs under the default guard
  }
}
