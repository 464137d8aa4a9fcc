package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JL sign random projection ([[Similarity.randomProjection]]). */
class RandomProjectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("randomProjection: exact Scala replay of one vector's projection") {
    val first = emb.filter(col("embedding").isNotNull &&
        size(col("embedding")) === 64)
      .orderBy("vec_id").limit(1)
      .select("vec_id", "embedding").collect()(0)
    val id = first.getLong(0)
    val v = first.getSeq[Float](1)
    val micros = v.map(x => math.round(x.toDouble * 1e6))
    val expected = (0 until 16).map { j =>
      (0 until 64).map { i =>
        val s = if (CrossHash.scalaHash56(s"rp:$j:$i") % 2 == 0) 1L else -1L
        s * micros(i)
      }.sum
    }
    val got = Similarity.randomProjection(emb, dims = 64, k = 16, salt = "rp")
      .filter(col("vec_id") === id).orderBy("j")
      .collect().map(_.getLong(2)).toSeq
    assert(got == expected)
  }

  test("randomProjection: k rows per qualifying vector, none for bad rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(1.0f, 2.0f)) // wrong width
    ).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, dims = 3, k = 5)
    assert(out.count() == 5)
    assert(out.select("vec_id").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    assert(out.select("j").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 5L))
  }

  test("randomProjection: zero-shuffle plan (narrow map over the scan)") {
    val plan = Similarity.randomProjection(emb, dims = 64, k = 16)
      .queryExecution.executedPlan.toString
    // no keyed exchange: the sign matrix is a closure literal, the
    // projection a row-local codegen'd map. Tables.load isn't in play
    // here (plain read), so ANY Exchange would be a regression.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in:\n$plan")
  }

  test("randomProjection: JL sketch preserves relative cosine ordering") {
    // For sign projections, <p_a, p_b> concentrates around a
    // monotone function of <a, b>: near-dup vectors must stay closer
    // in the sketch than unrelated ones. The testdata plants exact
    // groups of near-identical embeddings; check with the two nearest
    // + one far vector by brute force.
    val rows = emb.filter(col("embedding").isNotNull &&
        size(col("embedding")) === 64)
      .orderBy("vec_id").limit(60)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val (qid, qv) = rows.head
    val ranked = rows.tail.map { case (i, v) => (i, cos(qv, v)) }.sortBy(-_._2)
    val (nearId, nearCos) = ranked.head
    val (farId, farCos) = ranked.last
    assume(nearCos - farCos > 0.3) // meaningful separation in the sample
    val proj = Similarity.randomProjection(emb, dims = 64, k = 16)
      .filter(col("vec_id").isin(qid, nearId, farId))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3.toDouble).toSeq
      }
    val dNear = cos(proj(qid), proj(nearId))
    val dFar = cos(proj(qid), proj(farId))
    assert(dNear > dFar,
      s"sketch inverted the ordering: near=$dNear far=$dFar")
  }
}
