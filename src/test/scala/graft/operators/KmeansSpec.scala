package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lloyd trainer contracts: exact recovery of well-separated clusters,
  * size bookkeeping, determinism across runs, and the empty-corpus
  * degenerate case. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def clusterData(n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(5)
    // three tight unit-sphere caps around orthogonal axes — cosine
    // assignment must separate them perfectly from any same-cap seeds
    (0 until n).map { i =>
      val axis = i % 3
      val v = Array.fill(8)(rnd.nextFloat() * 0.1f)
      v(axis) = 1f
      (i.toLong, v)
    }
  }

  test("well-separated clusters are recovered; sizes sum to n") {
    val df = clusterData(300).toDF("id", "vec")
    val out = Similarity.kmeansTrain(df, "id", "vec", k = 3, iters = 4)
      .select("cid", "n").distinct()
      .as[(Int, Long)].collect().toMap
    assert(out.values.sum == 300)
    // seeds are ids 0,1,2 = one per cap, so each cap keeps its own cell
    assert(out.values.toSeq.sorted == Seq(100L, 100L, 100L))
  }

  test("k=1 converges to the corpus mean") {
    val df = clusterData(90).toDF("id", "vec")
    val got = Similarity.kmeansTrain(df, "id", "vec", k = 1, iters = 2)
      .select("dim", "c").as[(Long, Double)].collect().toMap
    val raw = clusterData(90).map(_._2)
    val mean = (0 until 8).map { d =>
      raw.map(_(d).toDouble).sum / raw.length
    }
    (0 until 8).foreach { d =>
      assert(math.abs(got(d.toLong) - mean(d)) < 1e-5, s"dim $d")
    }
  }

  test("training is deterministic across runs") {
    val df = clusterData(200).toDF("id", "vec")
    def run() = Similarity.kmeansTrain(df, "id", "vec", k = 4, iters = 3)
      .orderBy("cid", "dim").collect().toSeq
    assert(run() == run())
  }

  test("empty corpus yields an empty result with the contract schema") {
    val df = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    val out = Similarity.kmeansTrain(df, "id", "vec", k = 4, iters = 2)
    assert(out.columns.toSeq == Seq("cid", "dim", "c", "n"))
    assert(out.count() == 0)
  }
}
