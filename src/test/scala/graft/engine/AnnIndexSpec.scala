package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity
import graft.schema.StreamSchema

/** The persisted ANN retrieval index (round 10 — VERDICT r9 item 1):
  * `__anncent` codebooks + `__annidx` encoded corpus as managed sibling
  * streams, searches served from them bit-identical to the inline
  * retrain-per-call operators, with the same epoch-pinned lifecycle as
  * the `__lshidx`/`__mhpost` ingest indexes. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def newEngine(): Engine =
    new Engine(spark, tmpDir("graft-annidx"))

  /** Deterministic synthetic corpus: 60 vectors, 16 dims, clustered
    * around 4 axis directions with per-id jitter. */
  private def corpus(n: Int = 60, dims: Int = 16): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), j -> CAST(" +
        s"(CASE WHEN j % 4 = id % 4 THEN 4.0 ELSE 0.2 END) + " +
        "(pmod(xxhash64(id, j), 100) / 500.0) AS FLOAT))").as("embedding"))

  private def vecStream(e: Engine, name: String): Unit =
    e.createStream(name, StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))

  test("indexed IVF and PQ return exactly the inline operators' rows") {
    val e = newEngine()
    vecStream(e, "emb")
    val data = corpus()
    e.appendRows("emb", data)

    assert(e.ensureAnnIndex("emb", "vec_id", "embedding"),
      "first ensure must build")
    assert(!e.ensureAnnIndex("emb", "vec_id", "embedding"),
      "second ensure must take the live fast path")

    val inlineIvf = Similarity.ivfTopK(data, "vec_id", "embedding",
      col("vec_id") < 5, k = 3, nProbe = 2).collect().toSet
    val idxIvf = e.annTopKIndexed("emb", "vec_id", "embedding",
      col("vec_id") < 5, k = 3, nProbe = 2).collect().toSet
    assert(idxIvf == inlineIvf, "indexed IVF must equal inline ivfTopK")
    assert(inlineIvf.nonEmpty)

    val inlinePq = Similarity.pqTopK(data, "vec_id", "embedding",
      col("vec_id") < 5, k = 3, nProbe = 2, m = 8, ksub = 16).collect().toSet
    val idxPq = e.annTopKIndexed("emb", "vec_id", "embedding",
      col("vec_id") < 5, k = 3, nProbe = 2, method = "pq").collect().toSet
    assert(idxPq == inlinePq, "indexed PQ must equal inline pqTopK")
    assert(idxPq == idxIvf, "PQ's bound prune is exact by construction")

    // the other two family members served from the same stored
    // assignment (round 10): identical rows to the inline operators
    val inlineSem = Similarity.semDedup(data, "vec_id", "embedding",
      threshold = 0.8).collect().map(_.toSeq).toSet
    val idxSem = e.semDedupIndexed("emb", "vec_id", "embedding",
      threshold = 0.8).collect().map(_.toSeq).toSet
    assert(idxSem == inlineSem, "indexed semDedup must equal inline")
    val inlineKnn = Similarity.knnGraph(data, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    val idxKnn = e.knnGraphIndexed("emb", "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    assert(idxKnn == inlineKnn, "indexed knnGraph must equal inline")
    assert(inlineKnn.nonEmpty)
  }

  test("out-of-band writes to the main stream OR a sibling force a rebuild") {
    val e = newEngine()
    vecStream(e, "emb2")
    e.appendRows("emb2", corpus(40))
    assert(e.ensureAnnIndex("emb2", "vec_id", "embedding"))
    assert(!e.ensureAnnIndex("emb2", "vec_id", "embedding"))

    // main-stream out-of-band append: the index no longer covers the
    // corpus — the next ensure must rebuild, and the new row must be
    // retrievable afterward
    e.appendRows("emb2", Seq((1000L, Array.tabulate(16)(j =>
      if (j % 4 == 0) 4.2f else 0.25f))).toDF("vec_id", "embedding"))
    assert(e.ensureAnnIndex("emb2", "vec_id", "embedding"),
      "main-stream write must invalidate the index")
    val hits = e.annTopKIndexed("emb2", "vec_id", "embedding",
      col("vec_id") === 0, k = 41, nProbe = 64)
      .select("n_id").as[Long].collect()
    assert(hits.contains(1000L), "rebuilt index must cover the new row")

    // sibling out-of-band write: truncating __annidx must not leave a
    // silently-empty index on the fast path
    e.truncate(e.annIndexName("emb2"))
    assert(e.ensureAnnIndex("emb2", "vec_id", "embedding"),
      "sibling write must invalidate the index")
    // ...and the centroid sibling likewise
    e.truncate(e.annCentroidsName("emb2"))
    assert(e.ensureAnnIndex("emb2", "vec_id", "embedding"),
      "centroid-sibling write must invalidate the index")
    // config change is an epoch boundary too
    assert(e.ensureAnnIndex("emb2", "vec_id", "embedding", m = 4),
      "a config change must rebuild")
  }

  test("appendRowsAnnIndexed encodes the shard under the STANDING codebooks") {
    val e = newEngine()
    vecStream(e, "emb3")
    val base = corpus(48)
    e.appendRows("emb3", base)
    assert(e.ensureAnnIndex("emb3", "vec_id", "embedding"))
    val centEpoch0 = e.catalog.get(e.annCentroidsName("emb3")).get.writeEpoch

    val shard = spark.range(48, 60).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), j -> CAST(" +
        "(CASE WHEN j % 4 = id % 4 THEN 4.0 ELSE 0.2 END) + " +
        "(pmod(xxhash64(id, j), 100) / 500.0) AS FLOAT))").as("embedding"))
    e.appendRowsAnnIndexed("emb3", shard, "vec_id", "embedding")

    // the codebooks did NOT retrain — shard-sized work only
    assert(e.catalog.get(e.annCentroidsName("emb3")).get.writeEpoch
      == centEpoch0, "shard ingest must not retrain the codebooks")
    assert(e.catalog.get(e.annIndexName("emb3")).get
      .properties("ann_n").toLong == 60L)
    // the fast path survives the ingest (epochs re-pinned)
    assert(!e.ensureAnnIndex("emb3", "vec_id", "embedding"))

    // with EVERY cell probed, IVF over the frozen codebook is exact —
    // the indexed search must equal brute force over the grown corpus
    val cells = e.catalog.get(e.annIndexName("emb3")).get
      .properties("ann_kind")
    assert(cells == "flat")
    val full = e.readStream("emb3")
    val brute = Similarity.bruteForceTopK(full, "vec_id", "embedding",
      col("vec_id") < 3, k = 5).collect().toSet
    val viaIdx = e.annTopKIndexed("emb3", "vec_id", "embedding",
      col("vec_id") < 3, k = 5, nProbe = 4096).collect().toSet
    assert(viaIdx == brute,
      "all-cells probe over the standing index must equal brute force")

    // codebook-drift bound: with the growth cap forced to 1×, the next
    // ensure sees the corpus grown past the trained size and retrains
    spark.conf.set("spark.graft.ann.growthCap", "1")
    try {
      assert(e.ensureAnnIndex("emb3", "vec_id", "embedding"),
        "growth past the cap must trigger a codebook retrain")
      assert(e.catalog.get(e.annIndexName("emb3")).get
        .properties("ann_trained_n").toLong == 60L)
      assert(!e.ensureAnnIndex("emb3", "vec_id", "embedding"),
        "freshly retrained index is live again")
    } finally spark.conf.unset("spark.graft.ann.growthCap")
  }

  test("lifecycle: rename carries the ANN siblings, cascade drop removes them") {
    val e = newEngine()
    vecStream(e, "emb4")
    e.appendRows("emb4", corpus(30))
    e.ensureAnnIndex("emb4", "vec_id", "embedding")
    e.renameStream("emb4", "emb5")
    assert(e.catalog.get(e.annIndexName("emb4")).isEmpty &&
      e.catalog.get(e.annCentroidsName("emb4")).isEmpty)
    assert(e.catalog.get(e.annIndexName("emb5")).nonEmpty &&
      e.catalog.get(e.annCentroidsName("emb5")).nonEmpty)
    // the carried index is named right but its pinned epochs belong to
    // the renamed stream's def — searches still work (ensure rebuilds
    // if anything mismatches) and return sane rows
    val rows = e.annTopKIndexed("emb5", "vec_id", "embedding",
      col("vec_id") < 2, k = 3, nProbe = 2)
    assert(rows.count() > 0)
    e.dropStream("emb5")
    assert(e.catalog.get(e.annIndexName("emb5")).isEmpty &&
      e.catalog.get(e.annCentroidsName("emb5")).isEmpty,
      "cascade drop must take both ANN siblings")
  }

  test("HIERARCHICAL quantizer round-trips through the index (kind-2 rows)") {
    // past the (lowered) flat cap the stored codebook is two-level: top
    // centroids as kind-0 rows, per-top-cell sub-centroids as kind-2
    // rows re-packed on load — the indexed searches must still equal
    // the inline operators trained under the same cap
    val e = newEngine()
    vecStream(e, "embh")
    val data = corpus(120)
    e.appendRows("embh", data)
    spark.conf.set(graft.operators.Similarity.FlatCellCapKey, "4")
    try {
      assert(e.ensureAnnIndex("embh", "vec_id", "embedding"))
      assert(e.catalog.get(e.annIndexName("embh")).get
        .properties("ann_kind") == "hier", "cap 4 at n=120 must go hier")
      val inlineIvf = Similarity.ivfTopK(data, "vec_id", "embedding",
        col("vec_id") < 5, k = 3, nProbe = 2).collect().toSet
      val idxIvf = e.annTopKIndexed("embh", "vec_id", "embedding",
        col("vec_id") < 5, k = 3, nProbe = 2).collect().toSet
      assert(idxIvf == inlineIvf,
        "indexed hier IVF must equal inline hier ivfTopK")
      assert(idxIvf.nonEmpty)
      val inlinePq = Similarity.pqTopK(data, "vec_id", "embedding",
        col("vec_id") < 5, k = 3, nProbe = 2).collect().toSet
      val idxPq = e.annTopKIndexed("embh", "vec_id", "embedding",
        col("vec_id") < 5, k = 3, nProbe = 2, method = "pq").collect().toSet
      assert(idxPq == inlinePq,
        "indexed hier PQ must equal inline hier pqTopK")
      val inlineSem = Similarity.semDedup(data, "vec_id", "embedding",
        threshold = 0.8).collect().map(_.toSeq).toSet
      val idxSem = e.semDedupIndexed("embh", "vec_id", "embedding",
        threshold = 0.8).collect().map(_.toSeq).toSet
      assert(idxSem == inlineSem,
        "indexed hier semDedup must equal inline")
    } finally spark.conf.unset(graft.operators.Similarity.FlatCellCapKey)
  }

  test("ann_indexed_topk TVF resolves through the session-bound engine") {
    val e = newEngine()
    vecStream(e, "embsql")
    val data = corpus(50)
    e.appendRows("embsql", data)
    e.registerViews() // binds this engine as the session's TVF target
    val viaSql = spark.sql(
      """SELECT q_id, n_id, rnk, cos
        |FROM ann_indexed_topk('embsql', 'vec_id', 'embedding',
        |  'vec_id < 4', 3, 2)""".stripMargin).collect().toSet
    val viaApi = e.annTopKIndexed("embsql", "vec_id", "embedding",
      col("vec_id") < 4, k = 3, nProbe = 2).collect().toSet
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // without a bound engine the TVF is a loud analysis error, not a
    // silent empty result
    spark.conf.unset(Engine.RootConfKey)
    assertThrows[Exception] {
      spark.sql("SELECT * FROM ann_indexed_topk('embsql', 'vec_id', " +
        "'embedding', 'vec_id < 4', 3, 2)").queryExecution.analyzed
    }
  }

  test("empty corpus: index builds empty, search returns empty with schema") {
    val e = newEngine()
    vecStream(e, "emb6")
    assert(e.ensureAnnIndex("emb6", "vec_id", "embedding"))
    val out = e.annTopKIndexed("emb6", "vec_id", "embedding",
      col("vec_id") < 5, k = 3)
    assert(out.columns.toSeq == Seq("q_id", "n_id", "rnk", "cos"))
    assert(out.count() == 0)
  }
}
