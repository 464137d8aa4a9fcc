package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** [[QuantizerCellGuard]] — scale lint #3 (round 7): every
  * quantizer-family entry point must route its resolved (corpus size,
  * cell count) through the guard, so a compile-time-constant cell
  * count over a growing corpus (the Θ(n²/cells) regression class the
  * round-6 verdict measured at 5.5× cost per 10× data) fails the
  * Verify matrix instead of shipping. The guard is a runtime check at
  * quantizer-resolution time, not an optimizer rule — by the time a
  * LogicalPlan exists the cell count is an opaque literal. */
class QuantizerGuardSpec extends SparkSpec {

  private def withMode[T](mode: String)(f: => T): T = {
    spark.conf.set(QuantizerCellGuard.ModeKey, mode)
    try f finally spark.conf.set(QuantizerCellGuard.ModeKey, "off")
  }

  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  // 64 vectors is plenty: the guard fires on the CLAIMED corpus size
  // (knownCount), before any quantizer work touches the data
  private lazy val emb = (0L until 64L)
    .map(i => (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat)))
    .toDF("vec_id", "embedding")

  private val BigN = Some(10000000L) // ideal cells ≈ 3163; 4·8 < 3163 fires

  private def fires(f: => Any): Boolean =
    try { f; false }
    catch {
      case e: IllegalStateException
        if e.getMessage.contains("QuantizerCellGuard") => true
    }

  test("ivfCellCount is corpus-dimensioned: √n, clamped to [4, 4096]") {
    assert(Similarity.ivfCellCount(0) == 4)
    assert(Similarity.ivfCellCount(10) == 4)
    assert(Similarity.ivfCellCount(500) == 22)     // sf0.01 gate corpus
    assert(Similarity.ivfCellCount(2000) == 45)    // sf0.1
    assert(Similarity.ivfCellCount(20000) == 141)  // sf1
    assert(Similarity.ivfCellCount(100000000L) == 4096) // capped
    // monotone non-decreasing across three decades — a constant default
    // cannot satisfy this
    val pts = Seq(100L, 1000L, 10000L, 100000L, 1000000L)
      .map(Similarity.ivfCellCount)
    assert(pts == pts.sorted && pts.distinct.size == pts.size)
  }

  test("every quantizer entry point routes through the guard (fail mode, degenerate explicit cells)") {
    withMode("fail") {
      assert(fires(Similarity.semDedup(emb, "vec_id", "embedding",
        nCentroids = 4, knownCount = BigN)))
      assert(fires(Similarity.ivfTopK(emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 4, k = 3, nCentroids = 4,
        knownCount = BigN)))
      assert(fires(Similarity.pqTopK(emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 4, k = 3, nCentroids = 4,
        knownCount = BigN)))
      assert(fires(Similarity.cellBalancedSample(emb, "vec_id", "embedding",
        nCentroids = 4, knownCount = BigN)))
      assert(fires(Similarity.knnGraph(emb, "vec_id", "embedding",
        k = 3, nCentroids = 4, knownCount = BigN)))
      assert(fires(Similarity.bitextMine(emb, "vec_id", "embedding",
        sideA = col("vec_id") % 2 === 0, nCentroids = 4,
        knownCount = BigN)))
      // hardNegatives reaches the quantizer only in approx mode
      assert(fires(Similarity.hardNegatives(emb, "vec_id", "embedding",
        anchorPred = col("vec_id") < 4, loRank = 1, hiRank = 3,
        approx = true, nCentroids = 4, knownCount = BigN)))
    }
  }

  test("auto defaults are corpus-dimensioned and never fire the guard") {
    withMode("fail") {
      // default (nCentroids unset = auto): resolves ivfCellCount(64) = 8
      // cells and passes its own audit
      val out = Similarity.semDedup(emb, "vec_id", "embedding")
      assert(out.select(countDistinct("cell")).head().getLong(0) <= 8)
      // explicit-but-reasonable counts stay legal (recall/cost trades)
      Similarity.semDedup(emb, "vec_id", "embedding", nCentroids = 4,
        knownCount = Some(64L))
    }
  }

  test("off mode (default) never throws, warn mode logs but completes") {
    // off: degenerate explicit cells build fine (no audit cost either)
    Similarity.semDedup(emb, "vec_id", "embedding", nCentroids = 4,
      knownCount = BigN)
    withMode("warn") {
      Similarity.semDedup(emb, "vec_id", "embedding", nCentroids = 4,
        knownCount = BigN)
    }
  }
}
