package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ ANN ([[Similarity.pqTopK]]): the ADC estimate carries a
  * Cauchy–Schwarz error bound, the prune keeps every candidate whose
  * bound can still reach the top-k, and the exact re-rank therefore
  * reproduces exact IVF bit-for-bit UNCONDITIONALLY — the property that
  * lets the gate share the exact oracle at any scale (the round-6 sf1
  * differential killed the fixed-shortlist design that only held it
  * probabilistically). */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.load(spark, sf, "embeddings")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pqTopK == ivfTopK exactly (same cells, same exact re-rank order)") {
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3,
      m = 8, ksub = 16)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3)
    assert(canon(pq) == canon(ivf))
    assert(pq.count() == 50) // 10 queries × k=5
  }

  test("exactness holds for a coarser code too (m=16 sub-bytes)") {
    // a finer product split halves each subspace: different codes,
    // different bounds, SAME output — exactness cannot depend on the
    // code geometry, only pruning power may
    val pq16 = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3,
      m = 16, ksub = 16)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3)
    assert(canon(pq16) == canon(ivf))
  }

  test("the bound prune keeps a superset of k and never exceeds candidates") {
    val stats = Similarity.pqPruneStats(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3,
      m = 8, ksub = 16).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (cand, surv) = (r.getLong(1), r.getLong(2))
      assert(surv <= cand, s"q=${r.get(0)}: survivors $surv > cand $cand")
      assert(surv >= math.min(5L, cand),
        s"q=${r.get(0)}: survivors $surv cannot hold top-5 of $cand")
    }
  }

  test("plan: candidate generation is a cell equi-join, never cartesian") {
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5)
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("a zero-norm corpus vector neither crashes nor diverges from ivf") {
    import spark.implicits._
    // ANSI mode makes an unguarded double /0 or NaN→BIGINT cast a job
    // failure; the guards must keep the degenerate row conservative
    val base = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val poisoned = (base :+ ((9999L, Array.fill(64)(0.0f))))
      .toDF("vec_id", "embedding")
    val pq = Similarity.pqTopK(poisoned, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3)
    val ivf = Similarity.ivfTopK(poisoned, "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCentroids = 16, nProbe = 3)
    assert(canon(pq) == canon(ivf))
  }

  test("empty corpus returns empty frame with the contract schema") {
    val out = Similarity.pqTopK(emb.limit(0), "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5)
    assert(out.columns.toSeq == Seq("q_id", "n_id", "rnk", "cos"))
    assert(out.count() == 0)
  }
}
