package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graphs.labelPropagation]] — communities vs components, the
  * deterministic tie-break, self-vote damping, and replay identity. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(ids: Seq[Long], edges: Seq[(Long, Long)], rounds: Int = 4) =
    Graphs.labelPropagation(
      ids.toDF("id"), edges.toDF("id_a", "id_b"), rounds = rounds)
      .as[(Long, Long)].collect().toMap

  test("two cliques joined by one bridge stay two communities (one component)") {
    val ids = Seq(0L, 1L, 2L, 10L, 11L, 12L)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val got = run(ids, edges)
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // the same graph is ONE connected component — LPA is the finer cut
    val cc = Graphs.connectedComponentsLss(
      ids.toDF("id"), edges.toDF("id_a", "id_b"))
      .select("cluster_id").distinct().count()
    assert(cc == 1)
  }

  test("singletons keep their own label; isolated edge folds to its min") {
    val got = run(Seq(1L, 2L, 7L), Seq((1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("self-vote damps the synchronous 2-cycle on a bipartite path") {
    // without self-votes, a path's labels can oscillate under the
    // synchronous update; with them the min label wins and sticks
    val got = run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      rounds = 6)
    val again = run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      rounds = 7)
    assert(got == again, "labels must be stable once converged")
  }

  test("replay identity: same edges -> identical labeling across runs") {
    val ids = (0L until 300L)
    val edges = ids.flatMap(i => Seq((i, (i + 7) % 300), (i, (i * 13) % 300)))
      .filter { case (a, b) => a != b }
    val a = run(ids, edges)
    val b = run(ids, edges)
    assert(a == b)
  }

  test("edge input may carry duplicates and both orientations") {
    val clean = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    val dirty = run(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L)))
    assert(clean == dirty)
  }
}
