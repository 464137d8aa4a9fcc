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

  test("heapsFit recovers the exponent of a synthetic power-law corpus") {
    // build prefixes where V ~ N^0.5 exactly on the 8 ladder points:
    // shard k contributes tokens so that cum tokens = (k+1)^2 * 100 and
    // cum distinct types = (k+1) * 10  → beta = 0.5, K = 1
    val docs = (0 until 8).flatMap { k =>
      val newTypes = (0 until 10).map(j => s"t_${k}_$j")
      val cumTok = (k + 1) * (k + 1) * 100
      val prevTok = k * k * 100
      val need = cumTok - prevTok
      // `need` tokens in shard k: the 10 new types once each, filler from
      // an ALREADY-SEEN type (t_0_0, introduced in shard 0)
      val toks = newTypes ++ Seq.fill(need - 10)(if (k == 0) "t_0_0" else "t_0_0")
      Seq((k.toLong, toks.mkString(" ")))
    }.toDF("doc_id", "text")
    val got = Vocab.heapsFit(docs, nShards = 8)
      .as[(Long, Long, Long)].head()
    assert(got._1 == 8L)
    // ln V = ln 10 + 0.5 (ln N − ln 100) exactly → slope 0.5 up to the
    // per-point micro rounding of the logs
    assert(math.abs(got._2 - 500000L) <= 5L,
      s"beta must be 0.5 within log-rounding, got ${got._2}")
  }

  test("heapsFit: saturated corpus (all types in shard 0) fits beta 0 on all 8 points") {
    // every later shard reuses shard-0 vocabulary: V flat, N growing —
    // the zero-new-types shards MUST stay ladder points (left join)
    val docs = (0 until 8).map(k =>
      (k.toLong, Seq.fill(2 * (k + 1))("t0 t1 t2 t3 t4").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Vocab.heapsFit(docs, nShards = 8)
      .as[(Long, Option[Long], Option[Long])].head()
    assert(got._1 == 8L && got._2.contains(0L),
      s"flat vocabulary must fit beta=0 over all 8 points, got $got")
  }

  test("heapsFit: degenerate single-point ladder yields NULL, not an error") {
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val got = Vocab.heapsFit(docs, nShards = 8)
      .as[(Long, Option[Long], Option[Long])].head()
    assert(got == ((1L, None, None)))
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
