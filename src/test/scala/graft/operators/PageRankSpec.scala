package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank power iteration vs a plain-Scala reference of the same
  * recurrence, plus structural sanity (uniform graphs, star graphs,
  * dangling mass, multi-edge folding).
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: r'(v) = (1-d)/n + d * Σ_{u→v} r(u) * w_uv / W_u. */
  private def ref(
      edges: Seq[(Int, Int, Double)],
      nodes: Seq[Int],
      iters: Int,
      d: Double = 0.85): Map[Int, Double] = {
    val w = edges.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val out = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        val inflow = w.collect {
          case ((u, `v`), wuv) => r(u) * wuv / out(u)
        }.sum
        v -> ((1.0 - d) / n + d * inflow)
      }.toMap
    }
    r
  }

  private def run(
      edges: Seq[(Int, Int, Double)],
      nodes: Seq[Int],
      iters: Int): Map[Int, Double] =
    PageRank.run(edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  test("uniform cycle: ranks stay uniform and sum to 1") {
    val nodes = 0 until 5
    val edges = nodes.map(i => (i, (i + 1) % 5, 1.0))
    val r = run(edges, nodes, 4)
    r.values.foreach(v => assert(math.abs(v - 0.2) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("star graph: center outranks leaves; sink-only nodes get ranks") {
    val nodes = 0 until 6
    val edges = (1 until 6).map(i => (i, 0, 1.0))
    val r = run(edges, nodes, 3)
    assert((1 until 6).forall(i => r(0) > r(i)))
    // leaves are dangling after giving to the center: mass is dropped,
    // so the total is < 1 but every node keeps at least the teleport term
    assert(r.values.sum < 1.0 + 1e-12)
    nodes.foreach(i => assert(r(i) >= 0.15 / 6 - 1e-12))
  }

  test("multi-edges fold into summed weights") {
    val nodes = Seq(0, 1, 2)
    val dup = Seq((0, 1, 1.0), (0, 1, 2.0), (0, 2, 3.0), (1, 0, 1.0),
      (2, 0, 1.0))
    val folded = Seq((0, 1, 3.0), (0, 2, 3.0), (1, 0, 1.0), (2, 0, 1.0))
    val a = run(dup, nodes, 3)
    val b = run(folded, nodes, 3)
    nodes.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-15))
  }

  test("degenerate weights (0, negative, NaN, null) are ignored") {
    val nodes = Seq(0, 1, 2)
    val clean = Seq((0, 1, 1.0), (1, 2, 2.0), (2, 0, 1.0))
    val dirty = clean ++ Seq((0, 2, 0.0), (1, 0, -3.0), (2, 1, Double.NaN))
    val a = run(dirty, nodes, 3)
    val b = run(clean, nodes, 3)
    nodes.foreach(i => assert(a(i) === b(i), s"node $i"))
    // null weight rows drop the same way
    val withNull = clean.map { case (s, d, w) => (s, d, Option(w)) } :+
      ((0, 2, Option.empty[Double]))
    val c = PageRank.run(withNull.toDF("src", "dst", "w"),
      nodes.toDF("node"), 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    nodes.foreach(i => assert(c(i) === b(i), s"node $i (null row)"))
  }

  test("fuzz vs plain-Scala power iteration") {
    val rnd = new Random(13)
    for (trial <- 0 until 10) {
      val n = 4 + rnd.nextInt(12)
      val nodes = 0 until n
      val edges = (0 until n * 3).map { _ =>
        (rnd.nextInt(n), rnd.nextInt(n), 1.0 + rnd.nextInt(9))
      }
      val iters = 1 + rnd.nextInt(4)
      val expected = ref(edges, nodes, iters)
      val got = run(edges, nodes, iters)
      nodes.foreach { v =>
        assert(math.abs(got(v) - expected(v)) < 1e-9,
          s"trial $trial node $v: ${got(v)} vs ${expected(v)}")
      }
    }
  }
}
