package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential test: the PPJoin prefix-filter plan in
  * [[Dedup.ngramJaccardPairs]] must produce EXACTLY the brute-force
  * all-pairs result — same pairs, same Jaccard values — across random
  * corpora and thresholds. The expected answer is computed driver-side
  * in plain Scala over string n-gram sets (hashing is injective for the
  * comparison; a 64-bit collision would need ~2³² shingles). */
class JaccardEquivalenceSpec extends SparkSpec {

  private def ngrams(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  private def bruteForce(docs: Seq[(Long, String)], n: Int,
                         t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, s) => id -> ngrams(s, n) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (ia, ib, j)).toSet
  }

  test("prefix-filter equi-join == brute force over random corpora") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    for (seed <- 1 to 4; t <- Seq(0.3, 0.5, 0.75)) {
      val rnd = new scala.util.Random(seed * 1000 + (t * 100).toInt)
      val docs = (1L to 50L).map { id =>
        val len = 2 + rnd.nextInt(20)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val expected = bruteForce(docs, n = 2, t)
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 2, threshold = t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"seed=$seed t=$t: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("simhash Hamming-LSH banding == brute force over random corpora") {
    import spark.implicits._
    // near-dup structure: perturb a base sentence so hamming distances
    // spread around the threshold
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (seed <- 1 to 3; maxHamming <- Seq(6, 14)) {
      val rnd = new scala.util.Random(seed * 77 + maxHamming)
      val docs = (1L to 40L).map { id =>
        val len = 6 + rnd.nextInt(10)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      // brute force from the operator's own per-doc signatures (the
      // banding is what is under test, not the signature)
      val sigs = Dedup.simhash(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
        if h <= maxHamming
      } yield (a, b, h.toLong)).toSet
      val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"seed=$seed maxHamming=$maxHamming: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("queryPred bounds the probe side only") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b c d e"), (11L, "a b c d e"), // identical pair, both even/odd mix
      (13L, "a b c d x"), (20L, "a b c d x"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 2,
      threshold = 0.5, queryPred = col("id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the pred applies to the probe (id_a) side: pairs whose SMALLER id is
    // even survive — 10 pairs with everything; (11,13), (11,20), (13,20)
    // have odd probes and drop
    assert(got == Set((10L, 11L), (10L, 13L), (10L, 20L)))
  }

  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("edit-distance pairs == brute force (block AND verify) over random corpora") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (seed <- 1 to 3; maxEd <- Seq(2, 8)) {
      val rnd = new scala.util.Random(seed * 7 + maxEd)
      val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.size)))
      val docs = (1L to 40L).map { id =>
        // perturb a shared base so edit distances spread around maxEd
        val words = base.map(w =>
          if (rnd.nextInt(6) == 0) vocab(rnd.nextInt(vocab.size)) else w)
        id -> words.mkString(" ")
      }
      val sets = docs.map { case (id, s) => id -> ngrams(s, 2) }.toMap
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        inter = (sets(ia) & sets(ib)).size
        j = inter.toDouble / (sets(ia).size + sets(ib).size - inter)
        if j >= 0.3
        ed = lev(ta, tb)
        if ed <= maxEd
      } yield (ia, ib, j, ed.toLong)).toSet
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 2, blockJaccard = 0.3, maxEdits = maxEd)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(got == expected,
        s"seed=$seed maxEd=$maxEd: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("incremental shard-vs-index near-dup == full run restricted to cross pairs") {
    import spark.implicits._
    // both paths use the same hash family, signatures, and band keys, so
    // the incremental result must EXACTLY equal the full-corpus result
    // filtered to (incoming, existing) pairs — no probabilistic slop
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 31)
      val docs = (1L to 60L).map { id =>
        val len = 2 + rnd.nextInt(20)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val full = Dedup.minhashLsh(df, "doc_id", "text", threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // orient full-run pairs (id_a < id_b) as (incoming, existing)
      val expected = full.flatMap { case (a, b, j) =>
        if (a % 3 == 0 && b % 3 != 0) Some((a, b, j))
        else if (b % 3 == 0 && a % 3 != 0) Some((b, a, j))
        else None
      }
      val inc = Dedup.incrementalNearDups(
        existing = df.filter($"doc_id" % 3 =!= 0),
        incoming = df.filter($"doc_id" % 3 === 0),
        "doc_id", "text", threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(inc == expected,
        s"seed=$seed: missing=${expected -- inc} extra=${inc -- expected}")

      // round 9: the bulk-probe degradation path (sort-merge build past
      // spark.graft.dedup.probeHashBuildCap) must be result-identical to
      // the shuffle-hash plan — force the cap to 0 so EVERY probe takes
      // the merge branch, for both the text and embedding kernels
      spark.conf.set("spark.graft.dedup.probeHashBuildCap", "0")
      try {
        val incMerge = Dedup.incrementalNearDups(
          existing = df.filter($"doc_id" % 3 =!= 0),
          incoming = df.filter($"doc_id" % 3 === 0),
          "doc_id", "text", threshold = 0.4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(incMerge == expected,
          s"seed=$seed merge-plan: missing=${expected -- incMerge} " +
            s"extra=${incMerge -- expected}")
      } finally spark.conf.unset("spark.graft.dedup.probeHashBuildCap")
    }
  }

  test("embedding incremental kernel: merge-degraded plan == shuffle-hash plan") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val base = (1L to 40L).map(id => id -> vec())
    // plant cross-split near-dups: jittered copies of existing vectors
    val docs = base ++ Seq(100L -> base(2)._2.map(_ + 0.005f),
      105L -> base(7)._2.map(_ + 0.005f))
    val df = docs.toDF("vec_id", "embedding")
    def run(): Set[(Long, Long)] = Dedup.embeddingIncrementalNearDups(
      existing = df.filter($"vec_id" < 100L),
      incoming = df.filter($"vec_id" >= 100L),
      "vec_id", "embedding", threshold = 0.9, dims = 16)
      .select("in_id", "ex_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hash = run()
    assert(hash == Set((100L, 3L), (105L, 8L)))
    spark.conf.set("spark.graft.dedup.probeHashBuildCap", "0")
    try assert(run() == hash, "merge-degraded plan diverged")
    finally spark.conf.unset("spark.graft.dedup.probeHashBuildCap")
  }
}
