package graft.operators

import graft.SparkSpec

/** The degree-ordered triangle count vs a brute-force enumeration,
  * on dirty input (duplicates, self-loops, both orientations) and a
  * known hand-built graph. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("known graph: K4 plus a pendant and a square") {
    // K4 on 0-3: 4 triangles total, each K4 node sits in 3 of them;
    // pendant 4-0; square 5-6-7-8 (no triangles, all zero)
    val edges = Seq(
      (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), // K4
      (4, 0),                                         // pendant
      (5, 6), (6, 7), (7, 8), (8, 5))                 // C4
      .toDF("s", "d")
    val got = Graphs.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = Map(0 -> 3L, 1 -> 3L, 2 -> 3L, 3 -> 3L,
      4 -> 0L, 5 -> 0L, 6 -> 0L, 7 -> 0L, 8 -> 0L)
    assert(got == want, s"got $got")
  }

  test("random dirty graph == brute force (dups, loops, both orientations)") {
    val rnd = new scala.util.Random(11)
    val raw = Seq.fill(400)((rnd.nextInt(40), rnd.nextInt(40))) ++
      Seq((3, 3), (7, 7)) ++                // self-loops
      Seq.fill(50)((rnd.nextInt(40), rnd.nextInt(40))).flatMap(e =>
        Seq(e, e.swap))                     // duplicates both ways
    val got = Graphs.triangleCounts(raw.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val canon = raw.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2))
    def adj(a: Int, b: Int) = canon((math.min(a, b), math.max(a, b)))
    val want = nodes.map { n =>
      val count = (for {
        a <- nodes.toSeq; b <- nodes.toSeq
        if a < b && adj(n, a) && adj(n, b) && adj(a, b) && n != a && n != b
      } yield 1).size
      n -> count.toLong
    }.toMap
    assert(got == want, s"diverged from brute force")
    assert(want.values.sum > 0, "fixture must contain triangles")
  }
}
