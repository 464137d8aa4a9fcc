package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.bitextMine]] — margin-based bitext mining (Artetxe &
  * Schwenk 2019) against a full in-test replica of the pipeline
  * (single-cell config ⇒ candidates are ALL cross-side pairs, so the
  * replica is exhaustive truth), plus the structural mined-pair
  * contracts (mutual injectivity, side discipline, planted-pair
  * recovery under the real cell-blocked config). */
class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = Array.fill(dims)(r.nextGaussian().toFloat)
    val norm = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    v.map(_ / norm)
  }

  /** Even ids = side A, odd = side B; ids 2i/2i+1 with i % 3 == 0 are a
    * planted translation pair (near-identical vectors). */
  private def corpus(nPairs: Int) = {
    val rows = (0 until nPairs).flatMap { i =>
      val a = vec(i)
      val b =
        if (i % 3 == 0) {
          val j = vec(i + 500000)
          val mixed = a.zip(j).map { case (x, y) => x + 0.15f * y }
          val norm = math.sqrt(mixed.map(x => x * x.toDouble).sum).toFloat
          mixed.map(_ / norm)
        } else vec(i + 1000000)
      Seq((2L * i, a), (2L * i + 1, b))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's exact arithmetic, replayed over ALL cross-side
    * pairs (valid truth when the operator runs with nCentroids = 1). */
  private def replica(rows: Seq[(Long, Array[Float])], k: Int,
                      threshold: Double): Set[(Long, Long, Double, Double)] = {
    val a = rows.filter(_._1 % 2 == 0)
    val b = rows.filter(_._1 % 2 == 1)
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i)
      }
      round6(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
    val pairs = for ((sa, va) <- a; (sb, vb) <- b) yield {
      val c = cos(va, vb)
      (sa, sb, c, math.rint(c * 1000000L).toLong)
    }
    def topk(key: ((Long, Long, Double, Long)) => Long,
             other: ((Long, Long, Double, Long)) => Long) =
      pairs.groupBy(key).map { case (id, ps) =>
        id -> ps.sortBy(p => (-p._3, other(p))).take(k)
      }
    val knnA = topk(_._1, _._2)
    val knnB = topk(_._2, _._1)
    val sums = (m: Map[Long, Seq[(Long, Long, Double, Long)]]) =>
      m.map { case (id, ps) => id -> (ps.map(_._4).sum, ps.size.toLong) }
    val (sa, sb) = (sums(knnA), sums(knnB))
    val cand = pairs.filter(p =>
      knnA(p._1).contains(p) && knnB(p._2).contains(p))
    val scored = cand.map { case (s, d, c, micro) =>
      val (sumA, ca) = sa(s); val (sumB, cb) = sb(d)
      (s, d, c, round6(2.0 * micro * ca * cb / (sumA * cb + sumB * ca)))
    }
    val bestFwd = scored.groupBy(_._1).map { case (_, ps) =>
      ps.minBy(p => (-p._4, p._2)) }.toSet
    val bestBwd = scored.groupBy(_._2).map { case (_, ps) =>
      ps.minBy(p => (-p._4, p._1)) }.toSet
    bestFwd.intersect(bestBwd).filter(_._4 >= threshold)
  }

  test("single-cell mining equals the exhaustive replica exactly") {
    val rows = (0 until 40).flatMap { i =>
      Seq((2L * i, vec(i)), (2L * i + 1, vec(i + 1000000)))
    } ++ Seq((80L, vec(3)), (81L, vec(3 + 700000))) // one denser spot
    val expected = replica(rows, k = 4, threshold = 1.0)
    val got = Similarity.bitextMine(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", sideA = col("vec_id") % 2 === 0,
        k = 4, threshold = 1.0, nCentroids = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == expected,
      s"extra=${got.diff(expected)} missing=${expected.diff(got)}")
    assert(expected.nonEmpty, "degenerate truth — test proves nothing")
  }

  test("mined pairs are a partial matching across the two sides") {
    val mined = Similarity.bitextMine(corpus(60), "vec_id", "embedding",
      sideA = col("vec_id") % 2 === 0, k = 4, nCentroids = 4).collect()
    val as = mined.map(_.getLong(0))
    val bs = mined.map(_.getLong(1))
    assert(as.forall(_ % 2 == 0) && bs.forall(_ % 2 == 1),
      "side discipline violated")
    assert(as.distinct.length == as.length, "an id_a was mined twice")
    assert(bs.distinct.length == bs.length, "an id_b was mined twice")
  }

  test("planted translation pairs are recovered") {
    val mined = Similarity.bitextMine(corpus(60), "vec_id", "embedding",
        sideA = col("vec_id") % 2 === 0, k = 4, threshold = 1.0,
        nCentroids = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 60 by 3).map(i => (2L * i, 2L * i + 1)).toSet
    val recovered = planted.intersect(mined)
    // cell blocking can split a pair; near-identical vectors co-locate
    // under the cosine-argmax quantizer, so recovery should be high
    assert(recovered.size >= planted.size * 8 / 10,
      s"recovered only ${recovered.size}/${planted.size} planted pairs")
    // margins of planted pairs dominate their neighborhoods
    assert(mined.nonEmpty)
  }

  test("zero-norm vectors are dropped as candidates, never crash the mine") {
    // NaN cosines would hit the ANSI-invalid micro-unit cast, and an
    // all-zero neighborhood would hit the margin's /0 — both guarded
    val rows = (0 until 20).flatMap { i =>
      Seq((2L * i, vec(i)), (2L * i + 1, vec(i + 1000000)))
    } :+ ((40L, Array.fill(dims)(0.0f))) :+ ((41L, Array.fill(dims)(0.0f)))
    val mined = Similarity.bitextMine(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", sideA = col("vec_id") % 2 === 0,
      k = 4, threshold = 1.0, nCentroids = 1).collect()
    assert(!mined.exists(r => r.getLong(0) == 40L || r.getLong(1) == 41L),
      "a zero-norm vector was mined as a translation pair")
    assert(mined.nonEmpty, "the healthy pairs must still mine")
  }

  test("empty corpus yields an empty result with the output schema") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Similarity.bitextMine(empty, "vec_id", "embedding",
      sideA = col("vec_id") % 2 === 0)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "cos", "margin"))
    assert(out.count() == 0)
  }
}
