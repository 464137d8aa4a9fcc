package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sampling.negativeSample]] — deterministic hash-to-rank negative
  * mining: contract (k draws minus self-collisions), determinism,
  * corpus coverage, and the no-cross-join plan claim. */
class NegativeSampleSpec extends SparkSpec {

  private def ids(n: Long) = spark.range(n).select((col("id") * 3 + 7).as("doc_id"))

  test("exactly k draws per anchor minus replayed self-collisions") {
    val df = ids(500)
    val out = Sampling.negativeSample(df, "doc_id", col("doc_id") % 10 === 1, 7, "s")
      .cache()
    assert(out.filter(col("id_neg") === col("id_anchor")).count() == 0)
    // replay the draw rule in plain Scala (CrossHash.scalaHash56 is the
    // same md5 fold): per-anchor surviving-draw counts must match EXACTLY
    // — e.g. anchor 361 in this fixed corpus double-collides with itself
    val allIds = (0L until 500L).map(_ * 3 + 7).sorted
    val expected = allIds.filter(_ % 10 == 1).map { a =>
      val survived = (1 to 7).count { j =>
        val t = (CrossHash.scalaHash56(s"s:$a#$j") % 500 + 1).toInt
        allIds(t - 1) != a
      }
      a -> survived.toLong
    }.toMap
    val got = out.groupBy("id_anchor").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0),
      s"per-anchor draw counts diverge: ${got.toSet.diff(expected.toSet).take(5)}")
    out.unpersist()
  }

  test("deterministic across runs and partitionings") {
    val a = Sampling.negativeSample(ids(300), "doc_id", col("doc_id") % 5 === 0, 3, "x")
      .orderBy("id_anchor", "j").collect().toSeq
    val b = Sampling.negativeSample(ids(300).repartition(7), "doc_id",
      col("doc_id") % 5 === 0, 3, "x")
      .orderBy("id_anchor", "j").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("negatives spread over the corpus (not clustered at low ranks)") {
    val out = Sampling.negativeSample(ids(1000), "doc_id", col("doc_id") % 4 === 0, 4, "u")
    val negs = out.select("id_neg").collect().map(_.getLong(0))
    // doc_ids span [7, 3004]; a uniform draw must hit both halves
    val mid = 7 + (3 * 1000) / 2
    assert(negs.count(_ < mid) > negs.length / 5)
    assert(negs.count(_ >= mid) > negs.length / 5)
  }

  test("plan: rank lookup is an equi-join; the only nested loop is the 1-row count broadcast") {
    val plan = Sampling.negativeSample(ids(400), "doc_id",
      col("doc_id") % 10 === 0, 5, "p").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // crossJoin(broadcast(1-row count)) legitimately plans as a BNLJ —
    // the corpus-sized rank lookup must NOT
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[target"
      .r.findFirstIn(plan).isDefined,
      s"rank lookup is not a hash equi-join:\n$plan")
  }
}
