package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sorted-neighborhood blocking vs brute force — including heavy sort-key
  * ties (where only the id tiebreak makes the neighborhood well-defined)
  * — plus the no-single-partition-window plan contract. */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("pairs == brute-force sorted sliding window, heavy ties") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 500L).map(id => (id, rnd.nextInt(40).toLong))
    val w = 5
    val got = Dedup.sortedNeighborhoodPairs(rows.toDF("id", "v"), "id", "v", w)
      .as[(Long, Long, Long)].collect().toSet

    val sorted = rows.sortBy { case (id, v) => (v, id) }.map(_._1)
    val expected = (for {
      i <- sorted.indices
      d <- 1 until w
      if i + d < sorted.length
    } yield (sorted(i), sorted(i + d), d.toLong)).toSet
    assert(got == expected)
  }

  test("window=2 emits exactly the adjacent pairs; output is linear") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("id", "v")
    val got = Dedup.sortedNeighborhoodPairs(df, "id", "v", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L), (3L, 2L, 1L)))
  }

  test("plan has no single-partition window") {
    val df = (0L until 100L).map(id => (id, id % 7)).toDF("id", "v")
    val plan = Dedup.sortedNeighborhoodPairs(df, "id", "v", 3)
      .queryExecution.executedPlan.toString
    // every Window in the physical plan must be partitioned (the bucketed
    // rank's windows key on __graft_bkt); an empty partitionBy would show
    // as "Window [...], [v ASC..." with no partition spec
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty)
    assert(windows.forall(_.contains("__graft_bkt")),
      s"unpartitioned window in:\n$plan")
  }
}
