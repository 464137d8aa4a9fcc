package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Sampling, TextAnalysis}

/** The curation operators double as streaming transforms: everything that
  * is a pure projection (quality signals, PII redaction, hash
  * split/sample) runs unchanged over `readStream` — the same DataFrame
  * plan, incrementally executed. This is the "continuous ingest curation"
  * deployment: documents arrive on a stream, are scored/redacted/split
  * map-side, and land partitioned by split with no stateful operator at
  * all (so no watermark or state store is needed).
  */
class StreamingCurationSpec extends SparkSpec {

  test("quality + redaction + split compose over a document stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    val curated = Sampling.hashSplit(
      TextAnalysis.redactPii(
        TextAnalysis.quality(docs).join(docs, "doc_id")
          .filter(col("n_tokens") >= 3)),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")

    val q = curated.writeStream.format("memory").queryName("cur")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "mail me at a@b.co about the spark job"),
        (2L, "too short"), // 2 tokens -> filtered
        (3L, "plain clean text with several words"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, redacted, split FROM cur ORDER BY doc_id")
        .collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
      assert(rows(0).getString(1).contains("<EMAIL>"))
      assert(Set("train", "val", "test").contains(rows(0).getString(2)))
      // streaming assignment must equal the batch assignment (same hash)
      val batch = Sampling.hashSplit(
        Seq((1L, "x"), (3L, "x")).toDF("doc_id", "text"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.map(r => r.getLong(0) -> r.getString(2)).toMap == batch)
    } finally q.stop()
  }

  test("gopher filter + stateful exact dedup curate a stream across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // decision filter is a stateless projection; cross-batch exact dedup
    // is Structured Streaming's own state store via dropDuplicates on the
    // content hash — the streaming twin of Dedup.exactByHash
    val curated = docs
      .join(TextAnalysis.gopherFilter(docs, minWords = 4, minStopWords = 1)
        .select("doc_id", "keep"), "doc_id")
      .filter(col("keep"))
      .withColumn("content_key", md5(col("text")))
      .dropDuplicates("content_key")

    val q = curated.writeStream.format("memory").queryName("gcur")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown foxes jumped clean"),
        (2L, "bad"), // too few words → filtered by the rule
        (3L, "the quick brown foxes jumped clean")) // dup of 1 in-batch
      q.processAllAvailable()
      input.addData(
        (4L, "the quick brown foxes jumped clean"), // dup of 1 ACROSS batches
        (5L, "with some other perfectly fine words"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM gcur ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      // one survivor per content, rule-rejects gone, state spans batches
      assert(ids.length == 2)
      assert(ids.head == 1L || ids.head == 3L)
      assert(ids.last == 5L)
    } finally q.stop()
  }

  test("streaming near-dup signatures: minhash bands as a stateless projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // signature + band keys are per-row projections — the expensive half
    // of LSH dedup streams; only the band self-join needs a batch pass
    // (or a stream-stream join under a watermark)
    val sigs = docs.select(col("doc_id"),
      call_function("minhashes",
        array_sort(array_distinct(transform(
          graft.operators.Dedup.shingles(col("text"), 2), s => xxhash64(s)))),
        lit(16)).as("mh"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> xxhash64(b, slice(mh, b * 4 + 1, 4)))"))
          .as(Seq("band", "bkey")))

    val q = sigs.writeStream.format("memory").queryName("sigstream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon"), // exact dup -> same bands
        (3L, "totally different words entirely here"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, band, bkey FROM sigstream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(rows.count(_._1 == 1L) == 4)
      val bands1 = rows.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet
      val bands2 = rows.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet
      val bands3 = rows.filter(_._1 == 3L).map(t => (t._2, t._3)).toSet
      assert(bands1 == bands2) // identical text -> identical band keys
      assert(bands1.intersect(bands3).isEmpty)
    } finally q.stop()
  }

  test("incremental EMBEDDING dedup: the standing LSH index grows in place across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // near-orthogonal base vectors: cosine(vec(i), vec(j)) ≈ 0.04 for
    // i ≠ j, ≈ 1.0 for a jittered copy — clean above/below θ=0.8
    def vec(k: Int): Array[Float] =
      Array.tabulate(8)(d => if (d == k) 5f else 0.1f)
    def near(v: Array[Float]): Array[Float] = v.map(_ + 0.01f)
    val initial = Seq((100L, vec(0)), (101L, vec(1)))
    val batches = Seq(
      Seq((1L, near(vec(0))), (2L, vec(2))), // 1 dups index row 100
      // 3 dups row 2 — ADMITTED LAST BATCH: only index growth finds it
      Seq((3L, near(vec(2))), (4L, vec(3))))

    // streaming run: per micro-batch, probe the standing index with the
    // incremental kernel, then append the batch's novel rows to the
    // index — the index is UPDATED IN PLACE as the stream progresses
    var index = initial.toDF("vec_id", "embedding")
    val found = scala.collection.concurrent.TrieMap.empty[(Long, Long), Double]
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        val (pairs, cleanup) =
          graft.operators.Dedup.embeddingIncrementalNearDupsManaged(
            index, b, "vec_id", "embedding", threshold = 0.8, dims = 8)
        val dup = pairs.collect()
        dup.foreach(r => found((r.getLong(0), r.getLong(1))) = r.getDouble(2))
        val dupIds = dup.map(_.getLong(0)).distinct.toSeq
        index = index.unionAll(
          b.filter(!col("vec_id").isin(dupIds: _*))).localCheckpoint()
        cleanup(); b.unpersist(); ()
      }.start()
    try {
      batches.foreach { bd => input.addData(bd: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(found.keySet == Set((1L, 100L), (3L, 2L)))
    assert(found.values.forall(_ >= 0.99))

    // batch twin: the identical fold over plain DataFrames — the
    // streaming execution must produce exactly this pair set
    var idx2 = initial.toDF("vec_id", "embedding")
    val foldFound = scala.collection.mutable.Map.empty[(Long, Long), Double]
    batches.foreach { bd =>
      val b = bd.toDF("vec_id", "embedding")
      val dup = graft.operators.Dedup.embeddingIncrementalNearDups(
        idx2, b, "vec_id", "embedding", threshold = 0.8, dims = 8).collect()
      dup.foreach(r => foldFound((r.getLong(0), r.getLong(1))) = r.getDouble(2))
      val dupIds = dup.map(_.getLong(0)).distinct.toSeq
      idx2 = idx2.unionAll(b.filter(!col("vec_id").isin(dupIds: _*)))
    }
    assert(found.toMap == foldFound.toMap)

    // engine twin (round 9): the persisted-postings ingest path
    // (appendRowsDedupedEmbedding over the managed __lshidx stream) must
    // admit exactly the survivors the inline fold admits — the index
    // lives as a stream instead of a per-batch re-signature, same result
    val e = new graft.engine.Engine(spark, tmpDir("graft-stream-idx"))
    e.createStream("vstream", graft.schema.StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", "array<float>")))
    e.appendRows("vstream", initial.toDF("vec_id", "embedding"))
    batches.foreach { bd =>
      e.appendRowsDedupedEmbedding("vstream", bd.toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.8, dims = 8); ()
    }
    assert(e.readStream("vstream").select("vec_id").as[Long].collect().toSet
      == idx2.select(col("vec_id")).as[Long].collect().toSet)
  }

  test("incremental near-dup probes the standing index per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the continuous-ingest deployment of Dedup.incrementalNearDups:
    // each micro-batch of arriving documents probes the standing corpus
    // index inside foreachBatch — the shard-vs-index batch operator IS
    // the streaming ingest step, no separate code path
    val existing = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "totally different words entirely here"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val found = scala.collection.concurrent.TrieMap.empty[(Long, Long), Double]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Dedup.incrementalNearDups(existing, batch,
          "doc_id", "text", shingleN = 2, numHashes = 32, bands = 8,
          threshold = 0.5)
          .collect()
          .foreach(r => found((r.getLong(0), r.getLong(1))) = r.getDouble(2))
      }.start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon"), // dups index doc 100
        (2L, "unrelated content stream words arriving"))
      q.processAllAvailable()
      input.addData(
        (3L, "totally different words entirely here")) // dups 101, batch 2
      q.processAllAvailable()
      assert(found.keySet == Set((1L, 100L), (3L, 101L)))
      assert(found((1L, 100L)) == 1.0 && found((3L, 101L)) == 1.0)
    } finally q.stop()
  }
}
