package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sketches.exactQuantiles]] — exactness against the brute-force
  * order statistic on adversarial value shapes, and the two-pass plan. */
class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[Long], q: Double): Long = {
    val s = vals.sorted
    s(math.ceil(q * s.length).toInt - 1)
  }

  private def check(vals: Seq[(String, Long)], qs: Seq[Double]): Unit = {
    val df = vals.toDF("g", "v")
    val got = Sketches.exactQuantiles(df, Seq("g"), "v", qs)
      .as[(String, Double, Long)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    for ((g, gv) <- vals.groupBy(_._1); q <- qs) {
      val exp = brute(gv.map(_._2), q)
      assert(got((g, q)) == exp, s"group $g q=$q: got ${got((g, q))}, want $exp")
    }
  }

  test("heavy-tailed values, grouped: exact at p01/p50/p99/p100") {
    val vals = (0 until 5000).map { i =>
      (s"g${i % 3}", (math.exp(i % 37 / 3.0)).toLong * (i % 11 + 1))
    }
    check(vals, Seq(0.01, 0.5, 0.99, 1.0))
  }

  test("duplicate-heavy and zero values: bucket (0,0) and ties resolve exactly") {
    val vals = (0 until 2000).map(i => ("g", Seq(0L, 0L, 7L, 7L, 7L, 100L)(i % 6)))
    check(vals, Seq(0.1, 0.3, 0.5, 0.9, 1.0))
  }

  test("global (no group) matches brute force") {
    val vals = (0 until 3000).map(i => (i * 31L) % 977L)
    val got = Sketches.exactQuantiles(vals.toDF("v"), Nil, "v", Seq(0.5, 0.99))
      .as[(Double, Long)].collect().toMap
    assert(got(0.5) == brute(vals, 0.5) && got(0.99) == brute(vals, 0.99))
  }

  test("phase-2 rescan joins against a BROADCAST target-bucket table") {
    val df = (0 until 1000).map(i => ("g", i.toLong)).toDF("g", "v")
    val plan = Sketches.exactQuantiles(df, Seq("g"), "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"target table must broadcast:\n$plan")
  }
}
