package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ ANN ([[Similarity.pqTopK]]): the ADC shortlist + exact re-rank
  * must reproduce exact IVF bit-for-bit, and the shortlist must hold the
  * true neighbors with margin (the property that lets the gate share the
  * exact oracle). */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.load(spark, sf, "embeddings")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pqTopK == ivfTopK exactly (same cells, same exact re-rank order)") {
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3,
      m = 8, ksub = 16, shortlist = 128)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3)
    assert(canon(pq) == canon(ivf))
    assert(pq.count() == 50) // 10 queries × k=5
  }

  test("ADC shortlist holds the true top-k with margin (recall headroom)") {
    // shrink the shortlist well below the candidate volume: each query
    // sees ~900 probed-cell candidates here, so a 64-row shortlist
    // sufficing for exact recall demonstrates the codes carry real
    // ordering signal rather than the shortlist swallowing everything.
    // (Probe pq: overlap 21/50 at 20, 49/50 at 40, 50/50 from 64 — the
    // synthetic embeddings are near-random, so true-neighbor margins
    // are small and ADC needs ~13×k headroom; the gate uses 128.)
    val tight = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3,
      m = 8, ksub = 16, shortlist = 64)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3)
    assert(canon(tight) == canon(ivf))
  }

  test("plan: candidate generation is a cell equi-join, never cartesian") {
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5)
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("empty corpus returns empty frame with the contract schema") {
    val out = Similarity.pqTopK(emb.limit(0), "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5)
    assert(out.columns.toSeq == Seq("q_id", "n_id", "rnk", "cos"))
    assert(out.count() == 0)
  }
}
