package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.jaccardTopK]] against driver-side brute-force truth: exact
  * top-k among τ-floored neighbors, deterministic tie order, query-side
  * restriction honored. Same injective-hashing caveat as
  * [[JaccardEquivalenceSpec]]. */
class JaccardTopKSpec extends SparkSpec {

  private def ngrams(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  private def bruteTopK(docs: Seq[(Long, String)], n: Int, t: Double,
                        k: Int, pred: Long => Boolean): Set[(Long, Long, Long)] = {
    val sets = docs.map { case (id, s) => id -> ngrams(s, n) }
      .filter(_._2.nonEmpty)
    sets.filter(d => pred(d._1)).flatMap { case (ia, sa) =>
      val nbrs = sets.filter(_._1 != ia).flatMap { case (ib, sb) =>
        val inter = (sa & sb).size
        val j = if (sa.nonEmpty || sb.nonEmpty)
          inter.toDouble / (sa.size + sb.size - inter) else 0.0
        if (j >= t) Some((ib, j)) else None
      }
      nbrs.sortBy { case (ib, j) => (-j, ib) }.take(k).zipWithIndex
        .map { case ((ib, _), i) => (ia, ib, (i + 1).toLong) }
    }.toSet
  }

  test("banded top-k == brute-force top-k over random corpora") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(42 + seed)
      val docs = (0L until 40L).map { id =>
        val len = 4 + rnd.nextInt(8)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.jaccardTopK(df, "doc_id", "text", shingleN = 2,
        threshold = 0.25, k = 3, queryPred = col("id") % 2 === 0)
        .select("id_a", "id_b", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = bruteTopK(docs, 2, 0.25, 3, _ % 2 == 0)
      assert(got == want,
        s"seed $seed: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"seed $seed: degenerate test corpus (no pairs)")
    }
  }

  test("k bounds the per-query neighbor count; ranks are 1..k dense") {
    import spark.implicits._
    // 6 near-identical docs: every query has 5 neighbors above τ, k=2
    val docs = (0L until 6L).map(id =>
      id -> s"alpha beta gamma delta eps zeta tail$id").toDF("doc_id", "text")
    val out = Dedup.jaccardTopK(docs, "doc_id", "text", shingleN = 2,
      threshold = 0.2, k = 2).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size == 6)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 2, s"query $q has ${rows.length} rows")
      assert(rows.map(_.getAs[Long]("rnk")).sorted.sameElements(Array(1L, 2L)))
    }
  }
}
