package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 curation tranche: containment pairs, SemDedup, boilerplate
  * removal, bigram perplexity — hand-computed small-corpus semantics. */
class CurationOpsSpec extends SparkSpec {

  test("adaptiveRangeFilter matches a plain-Scala order-statistic model, duplicates and tiny groups included") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // groups of wildly different sizes; heavy value duplication
    val rows = (0 until 400).map { i =>
      val g = if (i % 17 == 0) "tiny" else if (i % 3 == 0) "mid" else "big"
      (i.toLong, g, 10 + rnd.nextInt(20))
    } :+ ((400L, "singleton", 7))
    val df = rows.toDF("id", "grp", "v")
    val (pLo, pHi) = (10, 90)
    val keep = operators_model(rows, pLo, pHi)
    val got = TextAnalysis.adaptiveRangeFilter(df, "grp", "v", pLo, pHi)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == keep)
    // singleton group: k_lo = k_hi = 1 → the row keeps itself
    assert(got.contains(400L))
  }

  private def operators_model(rows: Seq[(Long, String, Int)],
                              pLo: Int, pHi: Int): Set[Long] =
    rows.groupBy(_._2).flatMap { case (_, members) =>
      val sorted = members.map(_._3).sorted
      val n = sorted.size
      val lo = sorted((pLo * n + 99) / 100 - 1)
      val hi = sorted((pHi * n + 99) / 100 - 1)
      members.collect { case (id, _, v) if v >= lo && v <= hi => id }
    }.toSet

  test("containment is asymmetric: quoted span scores 1.0 one way only") {
    import spark.implicits._
    // doc 1 = a 6-word span; doc 2 = the same span inside a longer page
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro words here alpha beta gamma delta epsilon zeta plus a long unrelated tail of many extra words"),
      (3L, "totally different content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // all 4 of doc 1's 3-shingles appear verbatim in doc 2 → C(1,2) = 1.0
    assert(out((1L, 2L)) == 1.0)
    // doc 2 has 16 shingles, only 4 shared → C(2,1) = 0.25 < t, absent
    assert(!out.contains((2L, 1L)))
    assert(out.keys.forall(p => !p._1.equals(3L) && !p._2.equals(3L)))
  }

  test("containment pairs match brute force on a shingle-rich corpus") {
    import spark.implicits._
    val words = Vector("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    val docs = (0L until 30L).map { i =>
      val txt = (0 until 12).map(j => words(((i * 7 + j * j + j) % 8).toInt))
        .mkString(" ")
      (i, txt)
    }.toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute force: per-pair intersect over distinct 2-shingles
    val sh = docs.select(col("doc_id"),
      array_distinct(expr(
        """transform(sequence(0, size(split(text,' ')) - 2),
          |  i -> concat_ws(' ', slice(split(text,' '), i + 1, 2)))""".stripMargin))
        .as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = for {
      a <- sh.keys; b <- sh.keys if a != b
      c = sh(a).count(sh(b).contains).toDouble / sh(a).size
      if c >= 0.6
    } yield ((a, b), c)
    assert(fast == brute.toMap)
  }

  test("semDedup keeps the lowest id of an intra-cell duplicate pair") {
    import spark.implicits._
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.01f * i)
    val e2 = Array.tabulate(8)(i => if (i == 1) 1.0f else 0.0f)
    val docs = Seq(
      (10L, e1), (11L, e1.map(x => x * 2.0f)), // colinear → cos 1.0
      (20L, e2)
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(docs, "vec_id", "embedding",
      nCentroids = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(10L -> true, 11L -> false, 20L -> true))
  }

  test("semDedup distinct-direction vectors all survive") {
    import spark.implicits._
    val docs = (0 until 6).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.semDedup(docs, "vec_id", "embedding",
      nCentroids = 3, threshold = 0.5).collect()
    assert(out.length == 6 && out.forall(_.getBoolean(2)))
  }

  test("boilerplate removal cuts shared windows and reassembles in order") {
    import spark.implicits._
    val shared = "one two three four five six seven eight" // one exact window
    val docs = Seq(
      (1L, s"$shared unique1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, s"$shared only9 o10 o11 o12 o13 o14 o15 o16"),
      (3L, shared) // 100% boilerplate
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(docs, windowWords = 8, dfLimit = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "unique1 u2 u3 u4 u5 u6 u7 u8")))
    assert(out(2L) == ((2L, 1L, "only9 o10 o11 o12 o13 o14 o15 o16")))
    assert(out(3L) == ((1L, 0L, "")))
  }

  test("boilerplate: unique docs pass through verbatim (word-boundary segs)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k"), // 11 words → segments of 8 + 3
      (2L, "p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(docs, windowWords = 8, dfLimit = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "a b c d e f g h i j k",
                      2L -> "p q r s t u v w x y z"))
  }

  test("bigram perplexity matches the hand-computed interpolated LM") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Vocab.bigramLogPerplexity(docs, lambda = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // unigrams: a=3 b=2 c=1, total 6; bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    // ctx: a=3 b=1
    def lp(p: Double): Long = math.round(math.log(p) * 1000000L)
    val pAB = 0.5 * (2.0 / 3.0) + 0.5 * (2.0 / 6.0)
    val pBA = 0.5 * (1.0 / 1.0) + 0.5 * (3.0 / 6.0)
    val pAC = 0.5 * (1.0 / 3.0) + 0.5 * (1.0 / 6.0)
    val exp1 = -(2 * lp(pAB) + lp(pBA)).toDouble / (3 * 1000000L)
    val exp2 = -lp(pAC).toDouble / 1000000L
    assert(out(1L) == ((3L, exp1)))
    assert(out(2L) == ((1L, exp2)))
  }

  test("bigram perplexity: single-word docs are excluded") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val out = Vocab.bigramLogPerplexity(docs)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("dupNgramFraction flags shared 4-grams, distinct per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),       // grams: abcd bcde
      (2L, "a b c d x"),       // grams: abcd bcdx → shares abcd with 1
      (3L, "p q r s t u")      // grams all unique to 3
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramFraction(docs, "doc_id", "text", shingleN = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((2L, 0.5)))
    assert(out(2L) == ((2L, 0.5)))
    assert(out(3L) == ((3L, 0.0)))
  }

  test("tokenEntropy: uniform doc hits ln(k); repeated doc hits 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // 4 uniform types → H = ln 4
      (2L, "x x x x")    // single type → H = 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val lnQuarterMicro = math.round(math.log(0.25) * 1000000L)
    assert(out(1L) == ((4L, 4L, 1.0,
      -(4.0 * lnQuarterMicro) / (4 * 1000000L))))
    assert(out(2L) == ((4L, 1L, 0.25, -0.0)) || out(2L) == ((4L, 1L, 0.25, 0.0)))
  }

  test("oovRate counts occurrences outside the deterministic top-k") {
    import spark.implicits._
    // counts: a=4, b=2, c=1, d=1 → top-2 = {a, b}
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a a b d")
    ).toDF("doc_id", "text")
    val out = Vocab.oovRate(docs, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(1L -> ((4L, 0.25)), 2L -> ((4L, 0.25))))
  }

  test("removeBoilerplate matches a plain-Scala model on a fuzzed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val sharedBlock = "s1 s2 s3 s4" // 4 words = one whole window at w=4
    val docs = (0L until 60L).map { i =>
      val words = (0 until 3 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
      val txt = if (i % 3 == 0) (sharedBlock +: words).mkString(" ")
                else words.mkString(" ")
      (i, txt)
    }
    val w = 4
    // scala model: same segmentation, df over exact segment text, reassembly
    val segsOf = (t: String) => t.split(" ").grouped(w).map(_.mkString(" ")).toVector
    val df = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    val expect = docs.map { case (id, t) =>
      val segs = segsOf(t)
      id -> ((segs.size.toLong, segs.count(df(_) <= 1).toLong,
        segs.filter(df(_) <= 1).mkString(" ")))
    }.toMap
    val out = TextAnalysis.removeBoilerplate(docs.toDF("doc_id", "text"),
      windowWords = w, dfLimit = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == expect)
  }

  test("sentenceDedup keeps exactly the first occurrence of every segment") {
    import spark.implicits._
    val block = "s1 s2 s3 s4" // one whole window at w=4
    val docs = Seq(
      (1L, s"$block u1 u2 u3 u4"),       // first holder of the block
      (2L, s"$block v1 v2 v3 v4"),       // later copy → block cut
      (3L, s"w1 w2 w3 w4 $block"),       // later copy at a later position
      (4L, s"$block $block")             // intra-doc repeat: second cut
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceDedup(docs, windowWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, s"$block u1 u2 u3 u4")))
    assert(out(2L) == ((2L, 1L, "v1 v2 v3 v4")))
    assert(out(3L) == ((2L, 1L, "w1 w2 w3 w4")))
    assert(out(4L) == ((2L, 0L, "")))
  }

  test("sentenceDedup matches a plain-Scala model on a fuzzed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val w = 3
    val docs = (0L until 80L).map { i =>
      val words = (0 until 2 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    // model: first occurrence in (doc_id, seg_id) order survives
    val segsOf = (t: String) => t.split(" ").grouped(w).map(_.mkString(" ")).toVector
    val firstAt = scala.collection.mutable.Map[String, (Long, Int)]()
    docs.foreach { case (id, t) =>
      segsOf(t).zipWithIndex.foreach { case (s, p) =>
        if (!firstAt.contains(s)) firstAt(s) = (id, p)
      }
    }
    val expect = docs.map { case (id, t) =>
      val segs = segsOf(t).zipWithIndex
      val kept = segs.filter { case (s, p) => firstAt(s) == ((id, p)) }
      id -> ((segs.size.toLong, kept.size.toLong, kept.map(_._1).mkString(" ")))
    }.toMap
    val out = TextAnalysis.sentenceDedup(docs.toDF("doc_id", "text"),
      windowWords = w)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == expect)
  }

  test("maskDuplicatedSpans masks exactly the covered tokens, at any offset") {
    import spark.implicits._
    val span = "d1 d2 d3 d4" // 4 tokens, spanTokens = 4
    val docs = Seq(
      (1L, s"$span tail1 tail2 tail3"),          // span at pos 0..3
      (2L, s"head1 head2 $span after"),          // span at pos 2..5
      (3L, "u1 u2 u3 u4 u5 u6 u7"),              // no duplication
      (4L, "x1 x2 x3")                           // sub-span doc: excluded
    ).toDF("doc_id", "text")
    val out = Dedup.maskDuplicatedSpans(docs, "doc_id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 4L, "tail1 tail2 tail3")))
    assert(out(2L) == ((7L, 4L, "head1 head2 after")))
    assert(out(3L) == ((7L, 0L, "u1 u2 u3 u4 u5 u6 u7")))
    assert(!out.contains(4L))
  }

  test("maskDuplicatedSpans: overlapping duplicated windows merge their cover") {
    import spark.implicits._
    // doc 2 repeats doc 1's five-token run: windows (0..3) and (1..4)
    // both duplicate → positions 0..4 masked once, not double-counted
    val docs = Seq(
      (1L, "a b c d e x1 x2"),
      (2L, "a b c d e y1 y2")
    ).toDF("doc_id", "text")
    val out = Dedup.maskDuplicatedSpans(docs, "doc_id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((5L, "x1 x2")))
    assert(out(2L) == ((5L, "y1 y2")))
  }

  test("duplicateClusters: driver union-find and iterative paths agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 200L
    val ids = (1L to n).toDF("id")
    // random sparse graph: chains, cliques, singletons
    val pairs = (1 to 150).map { _ =>
      val a = 1L + rnd.nextInt(n.toInt); val b = 1L + rnd.nextInt(n.toInt)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("id_a", "id_b")
    val fast = Dedup.duplicateClusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iterative = Dedup.duplicateClusters(ids, pairs,
      driverUnionFindLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == iterative)
    // min-label invariant: every cluster id is its own cluster's minimum
    assert(fast.forall { case (id, c) => c <= id && fast(c) == c })
  }

  test("normalizeText matches a plain-Scala model on fuzzed ASCII") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val chars = "abcXYZ019 ..,!?-_@#  \t"
    val docs = (0L until 200L).map { i =>
      (i, (0 until rnd.nextInt(40)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    }
    def model(s: String): String =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val out = TextAnalysis.normalizeText(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, s) =>
      assert(out(id) == model(s), s"doc $id: '${s}' → '${out(id)}' vs '${model(s)}'")
    }
    // token counting: empty normalization yields 0, not 1
    val counts = TextAnalysis.normalizeText(Seq((1L, "!!! ...")).toDF("doc_id", "text"))
      .collect().head
    assert(counts.getString(1) == "" && counts.getLong(3) == 0L)
  }

  test("weightedSample replays the Efraimidis-Spirakis priorities exactly") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (i, 1L + (i % 7) * 10))
    val out = Sampling.weightedSample(rows.toDF("id", "wt"), "id", col("wt"),
      k = 10, salt = "spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // scala-side oracle: same hash, same u, same nano-rounded priority
    val expected = rows.map { case (id, w) =>
      val u = (CrossHash.scalaHash56(s"spec:$id") + 1L).toDouble / 7.2057594037927936e16
      // Spark's round = BigDecimal HALF_UP (math.round floors negative halves)
      (id, w, java.math.BigDecimal.valueOf(math.log(u) / w * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    }.sortBy { case (id, _, p) => (-p, id) }
      .take(10).zipWithIndex
      .map { case ((id, w, p), i) => (id, w, p, (i + 1).toLong) }
    assert(out.toSeq == expected)
    // heavier rows dominate the sample: mean weight of winners above corpus mean
    val meanAll = rows.map(_._2).sum.toDouble / rows.size
    val meanWin = out.map(_._2).sum.toDouble / out.length
    assert(meanWin > meanAll,
      s"winners' mean weight $meanWin should exceed corpus mean $meanAll")
  }

  test("oovRate top-k tie-break is by word ascending") {
    import spark.implicits._
    // b and c tie at 2; top-2 = {a(3), b} by (cnt desc, word asc)
    val docs = Seq((1L, "a a a b b c c")).toDF("doc_id", "text")
    val out = Vocab.oovRate(docs, k = 2).collect().head
    assert(out.getLong(1) == 7L && out.getDouble(2) == math.rint(2.0 / 7.0 * 1e6) / 1e6)
  }

  test("semantic decontamination drops the paraphrase-close rows only") {
    import spark.implicits._
    // corpus: one vector equal to a bench vector (cos 1), one negated
    // (cos -1), one orthogonal (cos 0) — only the equal one is removed
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(-1f, 0f, 0f)), (3L, Seq(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
    val bad = Similarity.semanticContaminatedIds(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.9)
      .as[Long].collect().toSeq
    assert(bad == Seq(1L))
  }

  test("dsirWeights: hand-computed Laplace log-ratios") {
    import spark.implicits._
    // target = doc 1 ("a a"); raw corpus = all three docs.
    // vocab: a: raw 3 / tgt 2, b: raw 3 / tgt 0; V = 2, totals 6 / 2.
    //   lr(a) = ln((2+1)/(2+2)) - ln((3+1)/(6+2)) = ln 1.5  =  405465 µ
    //   lr(b) = ln((0+1)/(2+2)) - ln((3+1)/(6+2)) = ln 0.5  = -693147 µ
    val docs = Seq((1L, "a a"), (2L, "b b"), (3L, "a b")).toDF("doc_id", "text")
    val out = Vocab.dsirWeights(docs, col("doc_id") === 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 2L && math.abs(out(1L)._2 - 0.405465) < 1e-6)
    assert(math.abs(out(2L)._2 - -0.693147) < 1e-6)
    assert(math.abs(out(3L)._2 - (405465L - 693147L) / 2e6) < 1e-9)
    // the target-like doc must outrank the raw-only doc
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2)
  }

  test("sourceQualityFilter: whole source drops, and minDocs bites") {
    import spark.implicits._
    // good: TTR 1.0 twice; bad: TTR 0.25 twice (mean 0.25 < 0.5);
    // tiny: one perfect doc but below the minDocs floor
    val docs = Seq(
      (1L, "good", "a b c d"), (2L, "good", "e f g h"),
      (3L, "bad", "a a a a"), (4L, "bad", "b b b b"),
      (5L, "tiny", "x y z w")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceQualityFilter(
      docs, minMeanTtr = 0.5, minDocs = 2L)
    val kept = out.select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
    val row = out.filter(col("doc_id") === 1L).collect().head
    assert(row.getAs[Double]("src_mean_ttr") == 1.0 &&
      row.getAs[Long]("src_docs") == 2L)
  }

  test("semantic decontamination removes every row of a contaminated id") {
    import spark.implicits._
    // id 1 appears twice (a re-embedded duplicate): one copy matches a
    // bench vector, the other is orthogonal. Id-level semantics — the
    // dual of semanticContaminatedIds — must drop BOTH copies.
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", bench, "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L))
  }

  test("range join: end-exclusive boundaries, multi-bucket spans, no pair loss at bucket edges") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start: IN (inclusive)
      (2L, ts("2024-01-07 23:59:59")), // last second: IN
      (3L, ts("2024-01-08 00:00:00")), // == end: OUT (exclusive)
      (4L, ts("2023-12-31 23:59:59")), // before: OUT
      (5L, ts("2024-01-04 12:00:00"))  // middle: IN
    ).toDF("pid", "pt")
    val iv = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")))
      .toDF("iid", "ws", "we")
    // width much smaller than the interval: span explodes over many
    // buckets and every contained point must still match exactly once
    for (width <- Seq(3600L, 86400L, 7L * 86400L)) {
      val got = RangeJoin.pointInInterval(points, "pt", iv, "ws", "we", width)
        .select("pid").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 5L), s"width=$width")
    }
  }

  test("range join: fractional-second ends keep their last bucket; inverted intervals match nothing") {
    import spark.implicits._
    // interval end 13:00:00.250 (exclusive) — a point at 13:00:00.100 is
    // INSIDE and lives in the hour-bucket that only the fractional part
    // of the end reaches; whole-second bucket math silently loses it
    val points = Seq(
      (1L, "2024-01-01 13:00:00.1"),  // in [.., 13:00:00.250): IN
      (2L, "2024-01-01 13:00:00.25"), // == end: OUT (exclusive)
      (3L, "2024-01-01 12:30:00.0"))  // middle: IN
      .toDF("pid", "s").select(col("pid"), col("s").cast("timestamp").as("pt"))
    val iv = Seq(
      (10L, "2024-01-01 12:00:00.0", "2024-01-01 13:00:00.25"),
      (11L, "2024-01-01 18:00:00.0", "2024-01-01 17:00:00.0"), // inverted
      (12L, "2024-01-01 19:00:00.0", "2024-01-01 19:00:00.0")) // empty
      .toDF("iid", "a", "b")
      .select(col("iid"), col("a").cast("timestamp").as("ws"),
        col("b").cast("timestamp").as("we"))
    for (width <- Seq(60L, 3600L)) {
      val got = RangeJoin.pointInInterval(points, "pt", iv, "ws", "we", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      assert(got.toSeq == Seq((1L, 10L), (3L, 10L)), s"width=$width")
    }
  }

  test("int8 quantization: zero vector, exact scale, bounded reconstruction error") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0f, 0f, 0f)),            // zero vector: scale 0, q all 0
      (2L, Seq(127f, -127f, 63.5f)),    // scale exactly 1.0
      (3L, Seq(0.1f, -0.2f, 0.4f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("scale") == 0.0 &&
      out(0).getAs[Long]("q_sum") == 0L && out(0).getAs[Long]("err_nano_sum") == 0L)
    assert(out(1).getAs[Double]("scale") == 1.0)
    // q = [127, -127, 64] (63.5 rounds half-up away from zero)
    assert(out(1).getAs[Long]("q_sum") == 64L &&
      out(1).getAs[Long]("q_abs_max") == 127L)
    // per-dim reconstruction error is at most scale/2 (+rounding slack)
    val r3 = out(2)
    val maxErrNano = r3.getAs[Double]("scale") / 2 * 1e9 * 3 + 3
    assert(r3.getAs[Long]("err_nano_sum") <= maxErrNano.toLong)
    assert(r3.getAs[Long]("q_abs_max") == 127L) // the max component hits full range
  }

  test("bm25TopK: tf raises rank, doc length penalizes, k truncates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark x"),        // tf 3, short
      (2L, "spark x y z"),                // tf 1, same length
      (3L, "spark x y z w v u t s r q"),  // tf 1, longer → length penalty
      (4L, "x y z w")                     // tf 0 → score 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("spark"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L),
      s"expected tf-then-length ranking, got ${out.toSeq}")
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
    assert(out.length == 3) // doc 4 truncated by k
  }

  test("hashedLinearScore: mean of per-token weights, sign sets keep") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, null)).toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(docs, dim = 16, salt = "s")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(!out.contains(3L)) // null text drops, not scores
    // replay the weight derivation in plain Scala via the shared hash
    def w(tok: String): Long = {
      val b = CrossHash.scalaHash56(tok) % 16
      math.round((CrossHash.scalaHash56(s"s:$b") / 3.6028797018963968e16 - 1.0)
        * 1000000.0)
    }
    assert(out(1L)._2 == w("alpha") + w("beta"))
    assert(out(2L)._2 == w("alpha"))
    assert(out(1L)._3 == out(1L)._2.toDouble / (2.0 * 1000000.0))
    assert(out(2L)._4 == (w("alpha") > 0))
  }

  test("ngramDiversity matches a plain-Scala distinct-n model per source") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("x0", "x1", "x2", "x3", "x4")
    val rows = (0 until 120).map { i =>
      val src = s"s${i % 3}"
      val text = (0 until 1 + rnd.nextInt(8))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (src, text)
    } :+ (("one_tok", "solo"))  // no bigram → dropped by the inner join
    val df = rows.toDF("source", "text")
    def model(src: String): (Long, Long, Long, Long, Long, Long) = {
      val toks = rows.filter(_._1 == src).map(_._2.split(" ").toSeq)
      val uni = toks.flatten
      val bi = toks.filter(_.size >= 2)
        .flatMap(w => w.init.zip(w.tail).map { case (a, b) => s"$a $b" })
      def micro(d: Long, t: Long): Long = math.round(d * 1e6 / t)
      (uni.size.toLong, uni.distinct.size.toLong,
        micro(uni.distinct.size.toLong, uni.size.toLong),
        bi.size.toLong, bi.distinct.size.toLong,
        micro(bi.distinct.size.toLong, bi.size.toLong))
    }
    val got = TextAnalysis.ngramDiversity(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set("s0", "s1", "s2"))
    Seq("s0", "s1", "s2").foreach(s => assert(got(s) == model(s), s))
  }

  test("leakage-safe split: no near-dup pair ever crosses a split boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30 near-dup families x 3 members (identical text per family) plus
    // unique singletons — every family MUST land whole in one split
    val docs = ((0 until 90).map { i =>
      val f = i % 30 // disjoint per-family vocabulary: no cross-family merge
      (i.toLong, (0 until 8).map(j => s"fam${f}w$j").mkString(" "))
    } ++ (100 until 140).map { i =>
      (i.toLong, s"unique document $i with words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    }).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 2, numHashes = 128, bands = 32, threshold = 0.5)
    val clusters = Dedup.duplicateClusters(
      docs.select(col("doc_id")), pairs, idCol = "doc_id")
    val split = Sampling.hashSplit(clusters, "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "ls1")
    // invariant 1: each cluster maps to exactly one split
    val perCluster = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("nsplits"))
      .agg(max("nsplits")).collect()(0).getLong(0)
    assert(perCluster === 1L)
    // invariant 2 (the actual leakage statement): no candidate near-dup
    // pair has its two sides in different splits
    val sideA = split.select(col("doc_id").as("id_a"), col("split").as("sa"))
    val sideB = split.select(col("doc_id").as("id_b"), col("split").as("sb"))
    val crossing = pairs.join(sideA, "id_a").join(sideB, "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossing === 0L)
    // sanity: the 30 families really did form 30 multi-doc clusters
    val multi = clusters.groupBy("cluster_id").count()
      .filter(col("count") >= 3L).count()
    assert(multi === 30L)
  }
}
