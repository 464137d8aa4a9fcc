package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Null robustness: real corpora contain null/empty text and metadata.
  * Every text/dedup/curation operator must either process or cleanly
  * drop such rows — never throw, never emit phantom matches. */
class NullSafetySpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq[(java.lang.Long, String, String, String)](
      (1L, "normal text with several words here", "en", "s1"),
      (2L, null, "en", "s1"), // null text
      (3L, "", "de", null), // empty text, null source
      (4L, "normal text with several words here", null, "s2")) // dup of 1, null lang
      .toDF("doc_id", "text", "lang", "source")
  }

  test("quality / langId / tokenCount / redactPii tolerate null and empty text") {
    assert(TextAnalysis.quality(docs).count() == 4)
    assert(TextAnalysis.langId(docs).count() == 4)
    assert(TextAnalysis.tokenCountBpe(docs).count() == 4)
    val red = TextAnalysis.redactPii(docs).collect()
    assert(red.length == 4)
    assert(red.forall(r => !r.anyNull || r.isNullAt(r.fieldIndex("redacted"))))
  }

  test("repetitionSignals tolerates null/empty text") {
    val out = TextAnalysis.repetitionSignals(docs)
    assert(out.count() == 4)
    assert(out.filter(col("doc_id") === 1).head().getLong(1) > 0)
  }

  test("dedup operators drop null-text rows instead of matching them") {
    val mh = Dedup.minhashLsh(docs, "doc_id", "text", shingleN = 2,
      numHashes = 32, bands = 8, threshold = 0.5).collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 4L)))
    val nj = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 2,
      threshold = 0.5).collect()
    assert(nj.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 4L)))
    // exact dedup: null text is a legitimate group key (SQL GROUP BY
    // semantics — nulls group together), never a crash
    assert(Dedup.exact(docs, Seq("text"), "doc_id").count() == 3)
    val sh = Dedup.simhash(docs, "doc_id", "text")
    assert(sh.count() == 4)
  }

  test("sampling / splitting are total over null group columns") {
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2), salt = "n")
    assert(split.count() == 4)
    val mix = Sampling.mixtureSample(docs, "doc_id", "lang",
      rates = Seq("en" -> 1.0), defaultRate = 1.0, salt = "n")
    assert(mix.count() == 4) // null lang falls to defaultRate, not dropped
    val quota = Sampling.quotaPerGroup(docs.select("lang", "doc_id"),
      Seq("lang"), "doc_id", n = 5, salt = "n")
    assert(quota.count() == 4) // null lang is its own group
  }

  test("decontaminate: null-text docs can never be flagged") {
    val bench = docs.filter(col("doc_id") === 1)
    val bad = Decontaminate.contaminatedIds(docs, "doc_id", "text",
      bench, "text", n = 2).collect().map(_.getLong(0)).toSet
    assert(bad == Set(1L, 4L))
    assert(Decontaminate.decontaminate(docs, "doc_id", "text", bench,
      "text", n = 2).count() == 2) // 2 and 3 survive
  }

  test("datasetCard groups null source/lang like SQL GROUP BY") {
    val card = TextAnalysis.datasetCard(docs)
    assert(card.count() == 3) // (s1,en)×2 merge; (null,de); (s2,null)
    assert(card.agg(sum("n_docs")).head().getLong(0) == 4)
  }

  test("gopherFilter: null text yields null signals and a non-keep verdict, never a throw") {
    val out = TextAnalysis.gopherFilter(docs, minWords = 1, minStopWords = 0)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    // null text → null rule columns → keep is null (three-valued AND),
    // which every filter treats as not-kept
    assert(out(1).isNullAt(out(1).fieldIndex("keep")) ||
      !out(1).getBoolean(out(1).fieldIndex("keep")))
    // empty text: 1 word of length 0 — rejected on mean length, no ANSI error
    assert(!out(2).getBoolean(out(2).fieldIndex("keep")))
  }

  test("vocab operators drop null text rather than counting phantom pairs") {
    assert(Vocab.bpeMergeCandidates(docs.filter(col("doc_id") === 2)).count() == 0)
    val pairs = Vocab.bpeMergeCandidates(docs)
    assert(pairs.filter(col("pair").isNull).count() == 0)
    // tf·idf: null-text docs contribute no words; null group key groups
    // like SQL GROUP BY; no throw
    val terms = Vocab.tfidfTerms(docs)
    assert(terms.filter(col("word").isNull).count() == 0)
  }

  test("topFractionPerGroup: null scores sort last and single/null groups survive") {
    import spark.implicits._
    val d = Seq[(String, java.lang.Long, java.lang.Long)](
      ("a", 1L, 5L), ("a", 2L, null), (null, 3L, 1L))
      .toDF("g", "id", "score")
    val kept = Sampling.topFractionPerGroup(d, Seq("g"), "score", "id", 0.5)
      .collect().map(_.getLong(1)).toSet
    // group a: ceil(0.5*2)=1 → the non-null score wins (desc sort puts
    // nulls last); null group: its own group, survives
    assert(kept == Set(1L, 3L))
  }

  test("round-3 curation operators tolerate null/empty text") {
    // containment: null/empty shingle sets drop, the dup pair still found
    val ct = Dedup.containmentPairs(docs, "doc_id", "text", shingleN = 2,
      threshold = 0.5).collect()
    assert(ct.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 4L), (4L, 1L)))
    // corpus-linear diagnostics: null text drops, everything else scores
    assert(Dedup.dupNgramFraction(docs, "doc_id", "text", 2).count() == 2)
    val ent = TextAnalysis.tokenEntropy(docs)
    assert(ent.filter(col("doc_id") === 1).head().getLong(1) == 6L)
    assert(ent.count() == 3) // null text drops; empty text = one "" token
    assert(Vocab.oovRate(docs, k = 3).count() == 3)
    val bp = TextAnalysis.removeBoilerplate(docs, windowWords = 3, dfLimit = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(bp.size == 3 && !bp.contains(2L)) // null text dropped
    assert(bp(1L) == "" && bp(4L) == "") // exact dups → all segments cut
    val bg = Vocab.bigramLogPerplexity(docs)
    assert(bg.count() == 2) // null and sub-2-word docs excluded
  }

  test("semDedup: null embedding survives with a null cell, never matches") {
    import spark.implicits._
    val d = Seq[(java.lang.Long, Array[Float])](
      (1L, Array(1f, 0f)), (2L, Array(2f, 0f)), (3L, null))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(d, "vec_id", "embedding",
      nCentroids = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("quantizer paths tolerate an EMPTY corpus (no seeds to collect)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semDedup(empty, "vec_id", "embedding").count() == 0)
    assert(Similarity.ivfTopK(empty, "vec_id", "embedding",
      col("vec_id") < 10, k = 5).count() == 0)
    assert(Similarity.bruteForceTopK(empty, "vec_id", "embedding",
      col("vec_id") < 10, k = 5).count() == 0)
  }

  test("labelCentroidStats: null vectors/labels never poison centroids") {
    import spark.implicits._
    val d = Seq[(java.lang.Long, Array[Float], java.lang.Integer)](
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0),
      (3L, null, 0), (4L, Array(1f, 1f), null))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidStats(d, "vec_id", "embedding", "label")
      .orderBy("label").collect()
    // posexplode drops the null vector from the centroid; the cosine pass
    // emits null micro for it, which sum() skips — n_vecs still counts it
    assert(out.length == 2)
    val l0 = out.find(r => !r.isNullAt(0)).get
    assert(l0.getLong(1) == 3L)
    assert(!l0.isNullAt(2))
  }

  test("incrementalNearDups drops null/empty text on either side") {
    import spark.implicits._
    val existing = Seq[(java.lang.Long, String)](
      (1L, "normal text with several words here"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val incoming = Seq[(java.lang.Long, String)](
      (10L, "normal text with several words here"), (11L, null), (12L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(existing, incoming, "doc_id", "text",
      shingleN = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // only the real text pair survives; nulls/empties never phantom-match
    // each other (null text ∩ null text must NOT be a pair)
    assert(got == Seq((10L, 1L)))
  }

  test("knnLabelVote: null neighbor labels are a votable group, never a crash") {
    import spark.implicits._
    // query 0 has three neighbors: two null-labeled, one labeled 7 —
    // the null group wins the vote (Spark GROUP BY keeps nulls) and the
    // result surfaces it as a null label rather than dropping the query
    val d = Seq[(java.lang.Long, Array[Float], java.lang.Integer)](
      (0L, Array(1f, 0f), 5),
      (1L, Array(1f, 0.1f), null), (2L, Array(1f, -0.1f), null),
      (3L, Array(1f, 0.2f), 7))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelVote(d, "vec_id", "embedding", "label",
      queryPred = col("vec_id") === 0, k = 3).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(1) && out.head.getLong(2) == 2L)
  }

  test("dsirWeights / sourceQualityFilter drop null text, never score it") {
    // dsir: explode(split(null)) yields no tokens — doc 2 is simply
    // absent from the output, not a zero/NaN row
    val dw = Vocab.dsirWeights(docs, col("doc_id") === 1L)
    assert(dw.filter(col("doc_id") === 2L).count() == 0)
    assert(dw.count() == 3) // empty text still scores (one "" token)
    // source filter: without the guard a null-text doc scores a perfect
    // ttr (size(null) = -1 ⇒ -1/-1) and inflates its source's mean;
    // with it, source s1's mean comes from doc 1 alone
    val sq = TextAnalysis.sourceQualityFilter(
      docs, minMeanTtr = 0.0, minDocs = 1L)
    assert(sq.filter(col("doc_id") === 2L).count() == 0)
    val s1 = sq.filter(col("source") === "s1").collect()
    assert(s1.length == 1 && s1.head.getAs[Long]("src_docs") == 1L)
  }

  test("sequence analytics drop null users/timestamps; privacy groups nulls") {
    import spark.implicits._
    val evs = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String)](
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"),
      (3L, null, 30L, "view"), // null user: excluded from funnel/cohort
      (4L, 2L, null, "view"), // null ts: excluded
      (5L, 2L, 40L, null), // null type: excluded from funnel/transitions
      // a SECOND null-user event that would pair with event 3 if null
      // users were chained as one pseudo-user — transitions must not
      // fabricate that view -> purchase edge
      (6L, null, 35L, "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val fun = Sequences.funnel(evs, Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fun === Seq((1L, 1L), (2L, 1L))) // only user 1 counts
    assert(Sequences.cohortRetention(evs)
      .agg(sum("users")).collect()(0).getLong(0) == 2L) // users 1 and 2
    // every surviving event is on epoch-day 0: one row, two distinct users
    // (the null-user and null-ts rows must not inflate the count)
    val rau = Sequences.rollingActiveUsers(evs).collect()
    assert(rau.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 2L)))
    val tm = Sequences.transitionMatrix(evs).collect()
    assert(tm.map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("view", "click"))) // null-type and null-ts rows never pair
    // k-anonymity: null QI values form their own equivalence class (SQL
    // GROUP BY semantics), they are neither dropped nor merged with
    // non-null classes
    val pdf = Seq(("a", 1), ("a", 2), (null, 3), (null, 4))
      .toDF("qi", "id")
    assert(Privacy.kAnonymize(pdf, Seq("qi"), 2L).count() == 4)
    assert(Privacy.kAnonymize(pdf, Seq("qi"), 3L).count() == 0)
    val prof = Privacy.anonymityProfile(pdf, Seq("qi"), col("id"), 2L, 2L)
    assert(prof.count() == 2)
    assert(prof.filter(col("qi").isNull).head().getBoolean(3))
  }
}
