package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Large/small-star components vs a local union-find on adversarial
  * shapes — the long CHAIN (worst case for plain propagation, the shape
  * this operator exists for), random graphs with dirty edges, and
  * agreement with duplicateClusters' min-label contract. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteComponents(n: Long,
                              pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // one more pass so every root is the true min
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def check(n: Long, pairs: Seq[(Long, Long)]): Unit = {
    val ids = (0L until n).toDF("id")
    val pdf = pairs.toDF("id_a", "id_b")
    val got = Graphs.connectedComponentsLss(ids, pdf, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == bruteComponents(n, pairs))
  }

  test("1000-node chain closes (the O(diameter) killer shape)") {
    check(1000L, (0L until 999L).map(i => (i, i + 1)))
  }

  test("random dirty graph: dups, self-loops, both orientations") {
    val rnd = new scala.util.Random(17)
    val pairs = (0 until 600).map { _ =>
      val a = rnd.nextInt(400).toLong
      val b = rnd.nextInt(400).toLong
      (a, b)
    } ++ Seq((5L, 5L), (7L, 3L), (3L, 7L), (7L, 3L))
    check(400L, pairs.filter { case (a, b) => a != b } :+ (5L, 5L))
  }

  test("singletons label themselves; empty pair set is fine") {
    check(20L, Nil)
  }

  test("agrees with duplicateClusters on the same graph") {
    val rnd = new scala.util.Random(23)
    val pairs = (0 until 300).map(_ =>
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val ids = (0L until 200L).toDF("id")
    val pdf = pairs.toDF("id_a", "id_b")
    val lss = Graphs.connectedComponentsLss(ids, pdf, "id")
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.duplicateClusters(ids, pdf, "id")
      .as[(Long, Long)].collect().toMap
    assert(lss == prop)
  }
}
