package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded-heap per-group sampler ([[Sampling.quotaPerGroupAgg]])
  * against its window-sort twin ([[Sampling.quotaPerGroup]]): identical
  * rows on adversarial shapes, and a plan with NO window/sort over the
  * corpus — the scale claim is that candidates aggregate map-side. */
class QuotaAggSpec extends SparkSpec {
  import spark.implicits._

  private def synth(n: Long, groups: Int) =
    spark.range(n).select(
      pmod(col("id"), lit(groups)).cast("string").as("g"),
      col("id"))

  test("matches quotaPerGroup row-for-row across k regimes") {
    val df = synth(5000, 7).repartition(8) // multiple partitions per group
    for (k <- Seq(1, 10, 113)) {
      val win = Sampling.quotaPerGroup(df, Seq("g"), "id", k, "s1")
        .orderBy("g", "id").collect().toSeq
      val agg = Sampling.quotaPerGroupAgg(df, Seq("g"), "id", k, "s1")
        .orderBy("g", "id").collect().toSeq
      assert(agg == win, s"k=$k diverged")
    }
  }

  test("groups smaller than k return every row; empty input returns none") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    val out = Sampling.quotaPerGroupAgg(tiny, Seq("g"), "id", 10, "s2")
      .orderBy("g", "id").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(out == Seq(("a", 1L), ("a", 2L), ("b", 3L)))
    assert(Sampling.quotaPerGroupAgg(tiny.filter(lit(false)), Seq("g"), "id", 3, "s2")
      .count() == 0)
  }

  test("heap tie/order handling: duplicate buckets fall back to id order") {
    // force bucket collisions by using 1 bucket... hashBucket is fixed at
    // 2^30 buckets inside the API, so instead synthesize adversarial ids
    // dense enough that some buckets collide across 40k ids — the pair
    // (bucket, id) ordering must still match the window's ORDER BY b, id
    val df = synth(40000, 3)
    val win = Sampling.quotaPerGroup(df, Seq("g"), "id", 25, "tie")
      .orderBy("g", "id").collect().toSeq
    val agg = Sampling.quotaPerGroupAgg(df, Seq("g"), "id", 25, "tie")
      .orderBy("g", "id").collect().toSeq
    assert(agg == win)
  }

  test("plan shape: partial/final typed aggregate, no Window, no corpus Sort") {
    val df = synth(10000, 5)
    val plan = Sampling.quotaPerGroupAgg(df, Seq("g"), "id", 10, "s3")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort leaked into the agg plan:\n$plan")
    // ObjectHashAggregate pair = map-side partial + final merge: the
    // heap summaries combine before the shuffle
    assert(plan.contains("ObjectHashAggregate"), plan)
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(sorts == 0, s"unexpected corpus sort:\n$plan")
  }
}
