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

  test("weighted quantiles match the brute weighted order statistic") {
    val rnd = new scala.util.Random(11)
    val vals = (0 until 3000).map { i =>
      (s"g${i % 3}", (math.exp(i % 23 / 2.0)).toLong + 1, (i % 7 + 1).toLong)
    }
    val df = vals.toDF("g", "v", "wt")
    val got = Sketches.exactWeightedQuantiles(df, Seq("g"), "v", "wt",
      Seq(0.1, 0.5, 0.9, 1.0))
      .as[(String, Double, Long)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    for ((g, gv) <- vals.groupBy(_._1); q <- Seq(0.1, 0.5, 0.9, 1.0)) {
      val sorted = gv.map(t => (t._2, t._3)).sortBy(_._1)
      val w = sorted.map(_._2).sum
      val target = math.ceil(q * w).toLong
      var cum = 0L
      val exp = sorted.find { case (_, wt) => cum += wt; cum >= target }.get._1
      assert(got((g, q)) == exp, s"group $g q=$q: got ${got((g, q))}, want $exp")
    }
  }

  test("weighted quantiles: zero/negative/null weights carry no mass") {
    val df = Seq(("g", 1L, Some(0L)), ("g", 2L, Some(5L)),
      ("g", 100L, Some(-3L)), ("g", 3L, None), ("g", 9L, Some(5L)))
      .toDF("g", "v", "wt")
    // only v=2 (w5) and v=9 (w5) carry mass: p50 → 2, p100 → 9
    val m = Sketches.exactWeightedQuantiles(df, Seq("g"), "v", "wt",
      Seq(0.5, 1.0)).as[(String, Double, Long)].collect()
      .map { case (_, q, v) => q -> v }.toMap
    assert(m(0.5) == 2L && m(1.0) == 9L, m.toString)
  }

  test("phase-2 rescan joins against a BROADCAST target-bucket table") {
    val df = (0 until 1000).map(i => ("g", i.toLong)).toDF("g", "v")
    val plan = Sketches.exactQuantiles(df, Seq("g"), "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"target table must broadcast:\n$plan")
  }
}
