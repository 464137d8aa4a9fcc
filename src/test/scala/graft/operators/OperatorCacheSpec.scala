package graft.operators

import graft.SparkSpec

/** [[OperatorCache]] — the long-lived-session cache-eviction contract
  * (round 6): a loop over the heaviest persisting gates pins executor
  * cache (signature frames, capstone stages), and one
  * `OperatorCache.clear` drains ALL of it — proving every operator
  * persist is CacheManager-tracked (Dataset-level, never raw RDD), so
  * an engine session that evicts between jobs holds a flat memory
  * profile no matter how many operator calls it serves. */
class OperatorCacheSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a gate loop pins cache; one clear drains every pinned RDD") {
    // start from a clean slate — earlier suites in the shared session
    // may have left pins of their own
    OperatorCache.clear(spark)
    assert(OperatorCache.pinnedCount(spark) == 0)

    // the named heavy persisters from the round-5 verdict: the PPJoin
    // shingle frame (containment_pairs), the MinHash signature frame
    // (dedup_minhash_lsh), a persisted capstone stage
    // (pipeline_curation_v6), and the LSH signature frame of the
    // embedding path
    val gates = Seq("containment_pairs", "dedup_minhash_lsh",
      "pipeline_curation_v6", "embedding_neardup",
      // bitextMine's ranked-candidate frame (round 6)
      "bitext_mine",
      // tfidfCosinePairs' weighted-posting frame (round 6)
      "tfidf_cosine_pairs",
      // Bloom.newRowsVia's probed-shard frame (round 6)
      "incremental_dedup_bloom",
      // Graphs.triangleCounts' canonical-edge frame (round 6)
      "triangle_counts")
    gates.foreach { name =>
      val q = graft.Queries.all.find(_.name == name)
        .getOrElse(fail(s"gate $name not found"))
      assert(q.fn(spark, sf).count() >= 0)
    }
    assert(OperatorCache.pinnedCount(spark) > 0,
      "expected the gate loop to pin executor cache")

    OperatorCache.clear(spark)
    assert(OperatorCache.pinnedCount(spark) == 0,
      "an operator persist survived clearOperatorCache — it is not " +
        "CacheManager-tracked (raw RDD persist?)")
  }

  test("cleared frames recompute on demand (eviction is safe, not lossy)") {
    val q = graft.Queries.all.find(_.name == "dedup_minhash_lsh").get
    val df = q.fn(spark, sf)
    val before = df.count()
    OperatorCache.clear(spark)
    assert(q.fn(spark, sf).count() == before)
    OperatorCache.clear(spark)
  }
}
