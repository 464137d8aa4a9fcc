package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the curation operators: deterministic sampling/splitting,
  * duplicate clustering, PII redaction, repetition signals. */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hashSplit: exhaustive, disjoint, deterministic, roughly proportional") {
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    // 500 docs: the 80/10/10 carve should land near 400/50/50
    assert(counts("train") > 350 && counts("train") < 450)
    assert(counts.keySet == Set("train", "val", "test"))
    // same salt → identical assignment; different salt → different carve
    val again = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
    assert(split.select("doc_id", "split").except(
      again.select("doc_id", "split")).isEmpty)
    val other = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s2")
    assert(!split.select("doc_id", "split").except(
      other.select("doc_id", "split")).isEmpty)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2), "s")
    }
  }

  test("hashSample: deterministic subset at ~the requested rate, plan is shuffle-free") {
    val s = Sampling.hashSample(docs, "doc_id", 0.2, salt = "x")
    val n = s.count()
    assert(n > 60 && n < 140, s"expected ~100 of 500, got $n")
    assert(s.except(Sampling.hashSample(docs, "doc_id", 0.2, salt = "x")).isEmpty)
    // membership at a lower rate is a subset of a higher rate (same salt)
    val s10 = Sampling.hashSample(docs, "doc_id", 0.1, salt = "x")
    assert(s10.join(s, Seq("doc_id"), "left_anti").isEmpty)
    // pure projection: no exchange in the plan
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSample must not shuffle:\n$plan")
  }

  test("quotaPerGroup: at most n per group, deterministic, hash-ordered draw") {
    val q = Sampling.quotaPerGroup(docs.select("lang", "doc_id"),
      Seq("lang"), "doc_id", n = 7, salt = "q")
    val per = q.groupBy("lang").count().collect().map(_.getLong(1))
    assert(per.forall(_ <= 7))
    assert(q.except(Sampling.quotaPerGroup(docs.select("lang", "doc_id"),
      Seq("lang"), "doc_id", n = 7, salt = "q")).isEmpty)
    // growing the quota only adds rows (prefix property of the hash order)
    val q9 = Sampling.quotaPerGroup(docs.select("lang", "doc_id"),
      Seq("lang"), "doc_id", n = 9, salt = "q")
    assert(q.join(q9, Seq("lang", "doc_id"), "left_anti").isEmpty)
  }

  test("duplicateClusters: components over a known pair graph, singletons self-cluster") {
    import spark.implicits._
    val ids = (1L to 8L).toDF("id")
    // components: {1,2,3} (chain), {4,5} (pair), {6,7} via 2 hops, {8} alone
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("duplicateClusters: long chain needs multiple propagation rounds") {
    import spark.implicits._
    val n = 12L
    val ids = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 1L), s"one chain component, got $got")
  }

  test("decontaminate: removes exactly the overlapping docs, keeps the rest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "totally unrelated words here now ok"),
      (3L, "short")).toDF("doc_id", "text")
    val bench = Seq((100L, "quick brown fox jumps high")).toDF("doc_id", "text")
    val bad = Decontaminate.contaminatedIds(corpus, "doc_id", "text",
      bench, "text", n = 4).collect().map(_.getLong(0)).toSet
    assert(bad == Set(1L)) // shares "quick brown fox jumps"
    val kept = Decontaminate.decontaminate(corpus, "doc_id", "text",
      bench, "text", n = 4).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L)) // sub-n docs can never be contaminated
  }

  test("bloom decontamination: superset of exact, FP-bounded on a real corpus") {
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = corpus.filter(org.apache.spark.sql.functions.col("doc_id") % 25 === 0)
      .limit(20)
    val exact = Decontaminate.contaminatedIds(corpus, "doc_id", "text",
      bench, "text", n = 4).collect().map(_.getLong(0)).toSet
    val bloom = Decontaminate.bloomContaminatedIds(corpus, "doc_id", "text",
      bench, "text", n = 4, fpp = 0.001).collect().map(_.getLong(0)).toSet
    // no false negatives, ever — the removal list may only grow
    assert(exact.subsetOf(bloom),
      s"bloom missed ${exact.diff(bloom)} — bloom filters cannot false-negative")
    // FP budget: extra docs ≤ corpus × (grams/doc × fpp) with slack
    assert(bloom.size - exact.size <= 50,
      s"${bloom.size - exact.size} extra ids exceeds the 1e-3 FP budget")
  }

  test("mixtureSample: per-group rates honored, deterministic, map literal plan") {
    val s = Sampling.mixtureSample(docs.select("doc_id", "lang"), "doc_id",
      "lang", rates = Seq("en" -> 1.0, "de" -> 0.0), defaultRate = 0.5,
      salt = "m")
    val byLang = s.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == all("en")) // rate 1.0 keeps everything
    assert(!byLang.contains("de")) // rate 0.0 keeps nothing
    val others = all.keySet - "en" - "de"
    assert(others.forall(l => byLang(l) > 0 && byLang(l) < all(l)))
    assert(!s.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("temperatureSample: α=1 is the identity; lower α flattens the mix") {
    val ids = docs.select("doc_id", "lang")
    // α=1 → every per-group rate is (n_min/n_g)^0 = 1 → all rows kept
    val natural = Sampling.temperatureSample(ids, "doc_id", "lang",
      alpha = 1.0, salt = "t")
    assert(natural.count() == ids.count())
    val all = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = all.minBy(_._2)._1
    val largest = all.maxBy(_._2)._1
    val flat = Sampling.temperatureSample(ids, "doc_id", "lang",
      alpha = 0.5, salt = "t")
    val byLang = flat.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest group keeps everything; the largest is down-sampled
    assert(byLang(smallest) == all(smallest))
    assert(byLang(largest) < all(largest))
    // deterministic: same α + salt reproduces the exact membership
    assert(flat.except(Sampling.temperatureSample(ids, "doc_id", "lang",
      alpha = 0.5, salt = "t")).isEmpty)
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(ids, "doc_id", "lang", alpha = 0.0, salt = "t")
    }
  }

  test("packShards: budget cuts, offsets contiguous within each group") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, 70L)).toDF("doc_id", "n_tok")
    val packed = Sampling.packShards(rows, "doc_id", "n_tok",
      budget = 100L, groups = 2, salt = "p").collect()
    // offsets within a group are 0, 70, 140, ... (cumsum of sizes)
    packed.groupBy(_.getAs[Long]("pack_group")).foreach { case (_, rs) =>
      val offs = rs.map(_.getAs[Long]("start_offset")).sorted
      assert(offs.head == 0L)
      assert(offs.zipWithIndex.forall { case (o, i) => o == 70L * i })
    }
    // shard = first-token position / budget
    assert(packed.forall(r =>
      r.getAs[Long]("shard") == r.getAs[Long]("start_offset") / 100L))
    // deterministic across runs
    val again = Sampling.packShards(rows, "doc_id", "n_tok",
      budget = 100L, groups = 2, salt = "p")
    assert(Sampling.packShards(rows, "doc_id", "n_tok", 100L, 2, "p")
      .except(again).isEmpty)
  }

  test("chunk: window/stride arithmetic hand-checked, every token covered") {
    import spark.implicits._
    val out = TextAnalysis.chunk(
      Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
        (2L, "a b")) // shorter than one window
        .toDF("doc_id", "text"),
      chunkTokens = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // steps = ceil((10-4)/2)+1 = 4 windows: [1..4],[3..6],[5..8],[7..10]
    assert(d1.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 4L))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, "a b", 2L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(Seq((1L, "x")).toDF("doc_id", "text"), 4, 5)
    }
  }

  test("canonicalBySource: priority wins within a cluster, ties by id; singletons survive") {
    import spark.implicits._
    val d = Seq(
      (1L, "curated"), (2L, "web"), (3L, "web"), // cluster 1: curated wins
      (4L, "web"), (5L, "web"), // cluster 4: tie -> lower id
      (6L, "unknown_source")) // singleton, unlisted source
      .toDF("doc_id", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "cluster_id")
    val kept = Dedup.canonicalBySource(d, clusters, "doc_id", "source",
      priority = Seq("curated", "web"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 6L))
  }

  test("attributionMatrix: dropped docs flow to the keeper's source; singletons vanish") {
    import spark.implicits._
    val d = Seq(
      (1L, "curated"), (2L, "web"), (3L, "web"), // cluster 1: curated keeps, web drops 2
      (4L, "web"), (5L, "web"),                  // cluster 4: web keeps, web drops 1
      (6L, "unknown_source"))                    // singleton: no flow
      .toDF("doc_id", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "cluster_id")
    val got = Dedup.attributionMatrix(d, clusters, "doc_id", "source",
      priority = Seq("curated", "web"))
      .orderBy("source_kept", "source_dropped")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("curated", "web", 2L), ("web", "web", 1L)))
  }

  test("contentOverlapUpset: subset masks and names, duplicates collapse per source") {
    import spark.implicits._
    val d = Seq(
      ("s0", "shared everywhere"), ("s1", "shared everywhere"),
      ("s2", "shared everywhere"),
      ("s0", "pairwise"), ("s1", "pairwise"), ("s1", "pairwise"), // dup in s1
      ("s2", "only two"),
      ("s3", "ignored source row"), // s3 not in the bit order: dropped
      ("s0", "solo")).toDF("source", "text")
    val got = Dedup.contentOverlapUpset(d, "source", "text",
      Seq("s0", "s1", "s2"))
      .orderBy("mask")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "s0", 1L),          // "solo"
      (3L, "s0+s1", 1L),       // "pairwise" (s1 dup collapses)
      (4L, "s2", 1L),          // "only two"
      (7L, "s0+s1+s2", 1L)))   // "shared everywhere"
  }

  test("datasetCard: hand-checked stats") {
    import spark.implicits._
    val d = Seq(
      (1L, "s1", "en", "a b c"), // 3 tokens (short)
      (2L, "s1", "en", Seq.fill(25)("w").mkString(" ")), // 25 tokens
      (3L, "s2", "de", "x y")) // 2 tokens (short)
      .toDF("doc_id", "source", "lang", "text")
    val card = TextAnalysis.datasetCard(d).orderBy("source").collect()
    val r1 = card(0)
    assert(r1.getString(0) == "s1" && r1.getLong(r1.fieldIndex("n_docs")) == 2)
    assert(r1.getLong(r1.fieldIndex("total_tokens")) == 28)
    assert(r1.getLong(r1.fieldIndex("min_tokens")) == 3)
    assert(r1.getLong(r1.fieldIndex("max_tokens")) == 25)
    assert(r1.getDouble(r1.fieldIndex("avg_tokens")) == 14.0)
    assert(r1.getDouble(r1.fieldIndex("short_doc_frac")) == 0.5)
    val r2 = card(1)
    assert(r2.getString(0) == "s2" && r2.getLong(r2.fieldIndex("n_docs")) == 1)
    assert(r2.getDouble(r2.fieldIndex("short_doc_frac")) == 1.0)
  }

  test("redactPii: masks all kinds, counts non-overlapping matches") {
    import spark.implicits._
    val out = TextAnalysis.redactPii(Seq(
      (1L, "mail a.b+c@ex.co and x@y.org ip 10.0.0.1 ssn 123-45-6789 tel 555 867 5309"),
      (2L, "clean text, no pii at all")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(r1.fieldIndex("n_email")) == 2)
    assert(r1.getLong(r1.fieldIndex("n_ipv4")) == 1)
    assert(r1.getLong(r1.fieldIndex("n_ssn")) == 1)
    assert(r1.getLong(r1.fieldIndex("n_phone")) == 1)
    assert(r1.getString(r1.fieldIndex("redacted")) ==
      "mail <EMAIL> and <EMAIL> ip <IPV4> ssn <SSN> tel <PHONE>")
    val r2 = out(1)
    assert(Seq("n_email", "n_ipv4", "n_ssn", "n_phone")
      .forall(c => r2.getLong(r2.fieldIndex(c)) == 0))
    assert(r2.getString(r2.fieldIndex("redacted")) == "clean text, no pii at all")
  }

  test("repetitionSignals: hand-checked fractions") {
    import spark.implicits._
    val out = TextAnalysis.repetitionSignals(Seq(
      (1L, "a b a b a"), // 5 words, 2 distinct; top bigram "a b" = 2 of 4
      (2L, "x y z w")) // no repeats; 3 unique bigrams, top share 1/3
      .toDF("doc_id", "text")).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(r1.fieldIndex("n_words")) == 5)
    assert(r1.getDouble(r1.fieldIndex("dup_word_frac")) == 0.6)
    assert(r1.getDouble(r1.fieldIndex("top_bigram_share")) == 0.5)
    val r2 = out(1)
    assert(r2.getDouble(r2.fieldIndex("dup_word_frac")) == 0.0)
    assert(r2.getDouble(r2.fieldIndex("top_bigram_share")) == 0.333333)
  }
}
