package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Engine
import graft.schema.StreamSchema

/** ANN quality measurement (round 11): [[Similarity.recallAtK]]'s
  * semantics, plus the structural recall properties of the index-served
  * IVF search — recall is monotone nondecreasing in nProbe (a larger
  * probe set is a candidate superset), probing EVERY cell reproduces
  * brute force exactly (recall 1.0 — the exact-scoring tail has nothing
  * left to lose), and queries the probe missed entirely score 0, not
  * absent. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  /** 2000 vectors in 16 planted clusters + deterministic jitter — the
    * geometry where a coarse quantizer earns its recall. */
  private def corpus(n: Int = 2000, dims: Int = 16): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), j -> CAST(" +
        "(pmod(xxhash64(pmod(id, 16), j), 2001) - 1000) / 1000.0 + " +
        "0.25 * ((pmod(xxhash64(id, j + 7777), 2001) - 1000) / 1000.0) " +
        "AS FLOAT))").as("embedding"))

  private def newIndexed(): (Engine, DataFrame) = {
    val e = new Engine(spark, tmpDir("graft-recall"))
    e.createStream("emb", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val data = corpus()
    e.appendRows("emb", data)
    e.ensureAnnIndex("emb", "vec_id", "embedding", nCentroids = 8)
    (e, data)
  }

  test("recallAtK: hit counting, rank-k truncation, missing queries score 0") {
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L))
      .toDF("q_id", "n_id", "rnk")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // all 3 of q1
      (2L, 22L, 1L), (2L, 99L, 2L), (2L, 20L, 4L)) // 1 in-rank hit for q2;
      .toDF("q_id", "n_id", "rnk")                 // the rank-4 row must
    val r = Similarity.recallAtK(approx, exact, k = 3) // not count; q3 absent
      .orderBy("q_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 1L, 0L), "hits per query")
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 3L, 3L))
    assert(r.map(_.getDouble(3)).toSeq == Seq(1.0, 0.333333, 0.0))
  }

  test("IVF recall is monotone in nProbe and exact at full probe width") {
    val (e, data) = newIndexed()
    val truth = Similarity.bruteForceTopK(data, "vec_id", "embedding",
      col("vec_id") < 24, k = 10).persist()
    val recalls = Seq(1, 2, 4, 8).map { nProbe =>
      val approx = e.annTopKIndexedServe("emb", "vec_id", "embedding",
        col("vec_id") < 24, k = 10, nProbe = nProbe)
      nProbe -> Similarity.recallAtK(approx, truth, k = 10)
        .agg(avg("recall")).head().getDouble(0)
    }
    recalls.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 1e-9,
        s"recall must not drop as nProbe grows: nProbe=$pa → $ra, " +
          s"nProbe=$pb → $rb")
    }
    // nProbe = nCentroids probes every cell: the candidate set is the
    // whole corpus (minus self), the scoring tail is exact cosine with
    // the same 6-dp rounding and n_id tie-break as bruteForceTopK, so
    // the rankings are identical — recall exactly 1.0, not approximately
    assert(recalls.last._2 == 1.0,
      s"full-width probe must reproduce brute force, got ${recalls.last._2}")
    // and on planted clusters even a single probe must find most of the
    // true neighborhood (deterministic data: this is a fixed number)
    assert(recalls.head._2 >= 0.5,
      s"single-probe recall collapsed on clustered data: ${recalls.head._2}")
    truth.unpersist()
    e.close()
  }

  test("annRecallMeasured + nProbe tuner: meets target, saturates at full width") {
    val (e, _) = newIndexed()
    // full-width probe (8 cells, nProbe = 8) reproduces brute force on
    // the sampled queries — measured recall exactly 1.0
    assert(e.annRecallMeasured("emb", "vec_id", "embedding",
      k = 10, nProbe = 8) == 1.0)
    // the tuner: recall achieved must meet the target, and the sweep
    // must stop at the fanout ceiling even for target 1.0 (probing more
    // than 8 cells buys nothing by construction)
    val (p9, r9) = e.annNProbeForRecall("emb", "vec_id", "embedding",
      targetRecall = 0.9, k = 10)
    assert(r9 >= 0.9, s"tuner returned nProbe=$p9 with recall $r9 < 0.9")
    val (pFull, rFull) = e.annNProbeForRecall("emb", "vec_id", "embedding",
      targetRecall = 1.0, k = 10)
    assert(rFull == 1.0 && pFull <= 8,
      s"full-recall sweep must saturate at the 8-cell codebook, " +
        s"got (nProbe=$pFull, recall=$rFull)")
    assert(p9 <= pFull, "a lower target can never need a wider probe")
    // the caller's cap is hard, even when non-power-of-two: the sweep
    // clamps its doubling to maxNProbe instead of overshooting past it
    val (pCap, _) = e.annNProbeForRecall("emb", "vec_id", "embedding",
      targetRecall = 1.0, k = 10, maxNProbe = 3)
    assert(pCap <= 3, s"sweep exceeded maxNProbe=3 with nProbe=$pCap")
    // without an index: the serve-path lifecycle error, not a rebuild
    val bare = new Engine(spark, tmpDir("graft-recall-bare"))
    bare.createStream("emb", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val err = intercept[IllegalStateException] {
      bare.annNProbeForRecall("emb", "vec_id", "embedding", 0.9)
    }
    assert(err.getMessage.contains("ann_index_rebuild"))
    bare.close(); e.close()
  }

  test("filtered recall: truth shares the serve path's eligible set") {
    // parity labels over mod-16 clusters: every cluster is half
    // ineligible, so if the ground truth were UNFILTERED the eligible-
    // only serve could never reach recall 1.0 (≈ half of each true
    // top-10 fails the predicate) — full-width recall == 1.0 is
    // therefore proof that truth and serve restrict to the SAME set
    val e = new Engine(spark, tmpDir("graft-recall-filt"))
    e.createStream("embf", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
        .add("label", "int")))
    e.appendRows("embf", corpus(500).withColumn("label",
      pmod(col("vec_id"), lit(2)).cast("int")))
    e.ensureAnnIndex("embf", "vec_id", "embedding", nCentroids = 8)
    val oddOnly = Some(col("label") === 1)
    assert(e.annRecallMeasured("embf", "vec_id", "embedding",
      k = 10, nProbe = 8, corpusPred = oddOnly) == 1.0,
      "full-width filtered probe must reproduce FILTERED brute force")
    // the tuner under the same filter meets its target (saturation at
    // the 8-cell fanout guarantees it can always reach 1.0)
    val (pF, rF) = e.annNProbeForRecall("embf", "vec_id", "embedding",
      targetRecall = 0.9, k = 10, corpusPred = oddOnly)
    assert(rF >= 0.9, s"filtered tuner returned nProbe=$pF, recall=$rF")
    e.close()
  }

  test("pin lifecycle: tuned width serves as AUTO, survives ingest, dies on rebuild") {
    val (e, _) = newIndexed()
    val (pTuned, _) = e.annNProbeForRecall("emb", "vec_id", "embedding",
      targetRecall = 0.95, k = 10, pin = true)
    val props = e.catalog.get(e.annIndexName("emb")).get.properties
    assert(props.get("ann_nprobe").contains(pTuned.toString))
    assert(props.contains("ann_nprobe_recall"))
    // AUTO (nProbe = 0) must serve exactly the pinned width's rows
    val auto = e.annTopKIndexedServe("emb", "vec_id", "embedding",
      col("vec_id") < 24, k = 10, nProbe = 0).collect().toSet
    val explicit = e.annTopKIndexedServe("emb", "vec_id", "embedding",
      col("vec_id") < 24, k = 10, nProbe = pTuned).collect().toSet
    assert(auto == explicit, "AUTO must serve the pinned width")
    // a frozen-codebook shard ingest keeps the pin (recall stays valid
    // within the drift bound)
    e.appendRowsAnnIndexed("emb",
      spark.range(2000, 2100).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> CAST(" +
          "(pmod(xxhash64(pmod(id, 16), j), 2001) - 1000) / 1000.0 + " +
          "0.25 * ((pmod(xxhash64(id, j + 7777), 2001) - 1000) / 1000.0) " +
          "AS FLOAT))").as("embedding")),
      "vec_id", "embedding", nCentroids = 8)
    assert(e.catalog.get(e.annIndexName("emb")).get.properties
      .contains("ann_nprobe"), "ingest under frozen codebooks keeps the pin")
    // a rebuild retrains the codebooks: the measurement is void and the
    // pin must go with it — AUTO falls back to the family default
    e.rebuildAnnIndex("emb", "vec_id", "embedding", nCentroids = 8,
      force = true)
    assert(!e.catalog.get(e.annIndexName("emb")).get.properties
      .contains("ann_nprobe"), "rebuild must strip the stale pin")
    e.close()
  }

  test("SQL surface: ann_recall TVF joins two views; measurement TVFs defer to execution") {
    val (e, _) = newIndexed()
    e.registerViews()
    val truth = Similarity.bruteForceTopK(corpus(), "vec_id", "embedding",
      col("vec_id") < 12, k = 5)
    truth.createOrReplaceTempView("r_exact")
    e.annTopKIndexedServe("emb", "vec_id", "embedding",
      col("vec_id") < 12, k = 5, nProbe = 2)
      .createOrReplaceTempView("r_approx")
    val viaSql = spark.sql(
      "SELECT * FROM ann_recall('r_approx', 'r_exact', 5) ORDER BY q_id")
    val direct = Similarity.recallAtK(
      spark.table("r_approx"), spark.table("r_exact"), 5).orderBy("q_id")
    assert(viaSql.collect().toSeq == direct.collect().toSeq)

    val tuned = spark.sql(
      """SELECT * FROM ann_nprobe_for_recall('emb', 'vec_id', 'embedding',
        |  0.9, 10)""".stripMargin).collect()
    assert(tuned.head.getString(0) == "emb")
    assert(tuned.head.getDouble(2) >= 0.9)
    val measured = spark.sql(
      """SELECT * FROM ann_recall_measured('emb', 'vec_id', 'embedding',
        |  10, 8)""".stripMargin).collect()
    assert(measured.head.getDouble(3) == 1.0)
    e.close()
  }

  test("PQ serve path returns the IVF rows (bound prune is exact)") {
    val (e, _) = newIndexed()
    val ivf = e.annTopKIndexedServe("emb", "vec_id", "embedding",
      col("vec_id") < 24, k = 10, nProbe = 2)
    val pq = e.annTopKIndexedServe("emb", "vec_id", "embedding",
      col("vec_id") < 24, k = 10, nProbe = 2, method = "pq")
    // subset AND same cardinality — exceptAll alone is one-directional
    // (pq emitting duplicate/extra rows would still pass it)
    assert(ivf.select("q_id", "n_id").exceptAll(pq.select("q_id", "n_id"))
      .isEmpty, "pq must serve exactly ivf's neighbor set")
    assert(pq.count() == ivf.count(),
      "pq must not emit rows beyond ivf's neighbor set")
    e.close()
  }
}
