package graft.operators

import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec

/** Vocabulary / tokenizer-training operators: BPE merge-candidate counts
  * and per-group tf·idf terms. */
class VocabSpec extends SparkSpec {

  import spark.implicits._

  test("bpeMergeCandidates counts adjacent char pairs weighted by occurrence") {
    val docs = Seq(
      "aba ab",   // aba -> ab, ba ; ab -> ab
      "ab x",     // ab -> ab ; x too short
      "ba").toDF("text")
    val got = Vocab.bpeMergeCandidates(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ab appears 3x (aba, ab, ab), ba 2x (aba, ba)
    assert(got.toSeq == Seq(("ab", 3L, 1L), ("ba", 2L, 2L)))
  }

  test("bpeMergeCandidates ties rank deterministically by pair") {
    val docs = Seq("cd ef cd ef").toDF("text")
    val got = Vocab.bpeMergeCandidates(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("cd", 2L, 1L), ("ef", 2L, 2L)))
  }

  test("tfidfTerms scores group-local terms above corpus-wide ones") {
    val docs = Seq(
      (0L, "common rare0", "s0"),
      (1L, "common rare0", "s0"),
      (2L, "common rare1", "s1"),
      (3L, "common other", "s1")).toDF("doc_id", "text", "source")
    val got = Vocab.tfidfTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    // 'common' has df=4=N → idf 0 → tfidf 0, so it can never rank first;
    // the group-local rare terms lead every group
    assert(got.filter(_._3 == 1L).map(_._2).forall(_ != "common"))
    assert(got.filter(_._1 == "s0").minBy(_._3)._2 == "rare0")
    assert(got.filter(_._1 == "s1").map(_._2).toSet == Set("rare1", "other"))
  }

  test("kneserNeyLogPerplexity matches a plain-Scala model on a fuzzed corpus") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (0L until 50L).map { i =>
      val words = (0 until 2 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    val d = 0.75
    // model: corpus bigram counts + KN continuation counts, micro-unit logs
    val bgOf = (t: String) => { val w = t.split(" "); w.dropRight(1).zip(w.drop(1)).toVector }
    val bi = docs.flatMap(x => bgOf(x._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = bi.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val nfr = bi.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val nto = bi.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val tt = bi.size.toDouble
    val lp = bi.map { case (k @ (w1, w2), c) =>
      k -> math.round(math.log((c - d) / ctx(w1)
        + d * nfr(w1) / ctx(w1) * (nto(w2) / tt)) * 1000000L)
    }
    val expect = docs.filter(_._2.split(" ").length >= 2).map { case (id, t) =>
      val bgs = bgOf(t)
      val s = bgs.map(lp).sum
      id -> ((bgs.size.toLong, -s.toDouble / (bgs.size * 1000000L)))
    }.toMap
    val out = Vocab.kneserNeyLogPerplexity(docs.toDF("doc_id", "text"), discount = d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == expect)
    // KN sanity: an equal-count bigram whose w2 has fewer distinct
    // histories must not score HIGHER continuation mass — "francisco"
    // follows only "san", so p(francisco | unseen-ish context) is tiny
    val kn = Vocab.kneserNeyLogPerplexity(Seq(
      (1L, "san francisco san francisco san francisco"),
      (2L, "the cat the dog the francisco end cat end dog end the")
    ).toDF("doc_id", "text"), discount = d)
    assert(kn.count() == 2)
  }

  test("perplexityBuckets bands per group by KN perplexity with id tie-break") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (0L until 60L).map { i =>
      val words = (0 until 2 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "), s"lang${i % 3}")
    }
    val df = docs.toDF("doc_id", "text", "lang")
    val ppl = Vocab.kneserNeyLogPerplexity(df.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // local ntile(3) model: per lang, sort by (ppl, id), bucket sizes
    // ceil-first (Spark/DuckDB ntile both front-load the remainder)
    val expect = docs.filter(d => ppl.contains(d._1)).groupBy(_._3).flatMap {
      case (_, ds) =>
        val sorted = ds.map(_._1).sortBy(id => (ppl(id), id))
        val n = sorted.size
        sorted.zipWithIndex.map { case (id, idx) =>
          val base = n / 3; val rem = n % 3
          // row idx falls in bucket b where buckets 1..rem have base+1 rows
          val b =
            if (idx < (base + 1) * rem) idx / (base + 1) + 1
            else (idx - rem) / base + 1
          id -> b
        }
    }
    val out = Vocab.perplexityBuckets(df).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out == expect)
    val bands = Vocab.perplexityBuckets(df).collect()
      .map(r => r.getInt(4) -> r.getString(5)).toSet
    assert(bands == Set(1 -> "head", 2 -> "middle", 3 -> "tail"))
  }

  test("pmiCollocations matches a plain-Scala PMI model on a fuzzed corpus") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val texts = (0 until 80).map { _ =>
      (0 until 1 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val docs = texts.toDF("text")
    val toks = texts.map(_.split(" ").toSeq).filter(_.size >= 2)
    val n1 = toks.map(_.size).sum.toDouble
    val n2 = toks.map(_.size - 1).sum.toDouble
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val minCount = 3L
    val model = toks.flatMap(w => w.init.zip(w.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minCount)
      .map { case ((a, b), cnt) =>
        val pmi = math.log((cnt / n2) /
          ((uni(a) / n1) * (uni(b) / n1)))
        // half-away-from-zero, the Spark round() / DuckDB round() rule
        val micro = BigDecimal(pmi * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (a, b, cnt, micro)
      }.toSeq
      .sortBy { case (a, b, _, m) => (-m, a, b) }.take(5)
      .zipWithIndex.map { case ((a, b, c, m), i) => (a, b, c, m, i + 1L) }
    val got = Vocab.pmiCollocations(docs, minCount = minCount, k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == model)
  }

  test("plan shape: no cartesian products beyond the 1-row N broadcast") {
    val docs = Seq((0L, "a b c", "s0")).toDF("doc_id", "text", "source")
    val plan: SparkPlan = Vocab.tfidfTerms(docs).queryExecution.executedPlan
    val cart = plan.collect {
      case p if p.nodeName.contains("CartesianProduct") => p
    }
    assert(cart.isEmpty, "tf·idf must join on word; only the 1-row N " +
      "aggregate may broadcast (BroadcastNestedLoopJoin), never a cartesian")
  }

  test("skipgramCooc matches brute-force windowed pairs on a fuzzed corpus") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 10) {
      val window = 1 + rnd.nextInt(4)
      val vocab = Vector("a", "b", "c", "d", "e")
      val docs = (0 until 60).map { _ =>
        (0 until 1 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(5)))
          .mkString(" ")
      }
      val exact = docs.map(_.split(" ").toSeq).filter(_.size >= 2)
        .flatMap { w =>
          for {
            i <- w.indices.dropRight(1)
            j <- (i + 1) to math.min(i + window, w.size - 1)
          } yield (w(i), w(j))
        }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= 2L)
      val got = Vocab.skipgramCooc(docs.toDF("text"), window = window,
        minCount = 2L, k = Int.MaxValue)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got === exact, s"trial $trial window=$window")
    }
  }

  test("skipgramCooc ranks deterministically and honors k") {
    val docs = Seq("a b a b a b", "a b c").toDF("text")
    val got = Vocab.skipgramCooc(docs, window = 2, minCount = 1L, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // pairs at window 2 in "a b a b a b": ab x3, ba x2, aa x2, bb x2;
    // "a b c": ab, ac, bc -> ab=4; ties (aa=2, ba=2, bb=2, ac=1, bc=1)
    // break lexicographically
    assert(got === Seq(("a", "b", 4L, 1L), ("a", "a", 2L, 2L),
      ("b", "a", 2L, 3L)))
  }

  test("featureHash == brute-force hashing trick; sign/bucket independent") {
    val docs = Seq((1L, "aa bb aa cc"), (2L, "bb bb"), (3L, ""),
      (4L, "dd  ee")).toDF("doc_id", "text")
    val dims = 16
    val got = Vocab.featureHash(docs, "doc_id", "text", dims, salt = "fh")
      .as[(Long, Int, Long)].collect()
      .map { case (d, dim, v) => (d, dim) -> v }.toMap
    val expected = Seq(1L -> "aa bb aa cc", 2L -> "bb bb", 3L -> "",
      4L -> "dd  ee")
      .flatMap { case (id, text) =>
        text.split(" ", -1).filter(_.nonEmpty).map { tok =>
          val h = CrossHash.scalaHash56(s"fh:$tok")
          (id, (h % dims).toInt) -> (1L - 2L * ((h >> 6) & 1L))
        }
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(got == expected)
    // both signs must occur somewhere, or the "signed" hash is a no-op
    assert(expected.values.exists(_ < 0) || expected.values.exists(_ > 0))
  }

  test("nextTokenTopK == brute-force bigram argmax with alphabetical ties") {
    val docs = Seq("a b a b a c", "b a b x", "z").toDF("text")
    val got = Vocab.nextTokenTopK(docs, k = 2, minCount = 1L)
      .select("w1", "w2", "cnt", "rn").as[(String, String, Long, Long)]
      .collect().toSet
    val bigrams = Seq("a b a b a c", "b a b x", "z")
      .map(_.split(" ").toSeq).filter(_.size >= 2)
      .flatMap(w => w.zip(w.tail))
    val expected = bigrams.groupBy(_._1).flatMap { case (w1, ps) =>
      ps.groupBy(_._2).map { case (w2, xs) => (w2, xs.size.toLong) }
        .toSeq.sortBy { case (w2, c) => (-c, w2) }.take(2).zipWithIndex
        .map { case ((w2, c), i) => (w1, w2, c, i + 1L) }
    }.toSet
    assert(got == expected)
  }

  test("nextTokenNucleus == brute-force minimal top-p prefix") {
    val docs = Seq("a b a b a c a b a d", "b a b x", "z").toDF("text")
    val got = Vocab.nextTokenNucleus(docs, pNum = 7L, pDen = 10L)
      .select("w1", "w2", "cnt", "n_ctx", "cum", "rn")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val bigrams = Seq("a b a b a c a b a d", "b a b x", "z")
      .map(_.split(" ").toSeq).filter(_.size >= 2)
      .flatMap(w => w.zip(w.tail))
    val expected = bigrams.groupBy(_._1).flatMap { case (w1, ps) =>
      val ranked = ps.groupBy(_._2)
        .map { case (w2, xs) => (w2, xs.size.toLong) }
        .toSeq.sortBy { case (w2, c) => (-c, w2) }
      val n = ranked.map(_._2).sum
      val target = (7L * n + 9L) / 10L
      val cums = ranked.scanLeft(0L)(_ + _._2)
      ranked.zipWithIndex.collect {
        case ((w2, c), i) if cums(i) < target =>
          (w1, w2, c, n, cums(i) + c, i + 1L)
      }
    }.toSet
    assert(got == expected)
    // 'a' has successors b:4, c:1, d:1 (n=6, target ⌈4.2⌉=5): nucleus
    // must be {b, c} — b alone (4) is short, b+c (5) reaches it
    assert(got.filter(_._1 == "a").map(_._2) == Set("b", "c"))
  }

  test("nextTokenNucleus p=1 keeps every surviving successor") {
    val docs = Seq("a b a c a b", "q r").toDF("text")
    val got = Vocab.nextTokenNucleus(docs, pNum = 1L, pDen = 1L)
    val all = Vocab.nextTokenTopK(docs, k = Int.MaxValue, minCount = 1L)
    assert(got.count() == all.count())
  }

  test("zipfFit recovers a known power law and flags flat sources") {
    // synthetic slice: term t_r appears round(1000/r) times => slope ~ -1
    val zipfy = (1 to 20).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(f"t$r%02d")
    }.mkString(" ")
    // flat slice: every term equally frequent => slope ~ 0
    val flat = (1 to 20).flatMap(r => Seq.fill(50)(f"u$r%02d")).mkString(" ")
    val docs = Seq(("zipfy", zipfy), ("flat", flat)).toDF("source", "text")
    val got = Vocab.zipfFit(docs, "source", k = 20)
      .select("source", "slope_micro").as[(String, Long)].collect().toMap
    assert(math.abs(got("zipfy") + 1000000L) < 30000L,
      s"expected slope near -1, got ${got("zipfy") / 1e6}")
    assert(math.abs(got("flat")) < 10000L,
      s"expected slope near 0, got ${got("flat") / 1e6}")
  }

  test("plan shape: pmiCollocations joins on word, 1-row totals broadcast only") {
    val docs = Seq("a b a b c", "a b x y").toDF("text")
    val plan: SparkPlan =
      Vocab.pmiCollocations(docs, minCount = 1L).queryExecution.executedPlan
    val cart = plan.collect {
      case p if p.nodeName.contains("CartesianProduct") => p
    }
    assert(cart.isEmpty, "the unigram joins must stay equi-joins on word; " +
      "only the 1-row N₁/N₂ aggregate may ride a BroadcastNestedLoopJoin")
    val bnlj = plan.collect {
      case p if p.nodeName.contains("BroadcastNestedLoopJoin") => p
    }
    assert(bnlj.size <= 1, "exactly the one scalar-totals broadcast allowed")
  }
}
