package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rank-sum AUC against a brute-force pair count: AUC is literally
  * P(pos > neg) + P(pos = neg)/2, so the oracle enumerates every
  * (positive, negative) pair. Covers ties, perfect/inverted separation,
  * single-class groups (dropped), and null hygiene. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Long, Boolean)]): Option[Double] = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      Some(wins.toDouble / (2.0 * pos.size * neg.size))
    }
  }

  test("aucByGroup == brute-force pair enumeration (with heavy ties)") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 3).flatMap { g =>
      (0 until 300).map { _ =>
        // score domain of just 20 values forces tie handling
        (s"g$g", rnd.nextInt(20).toLong, rnd.nextInt(3) == 0)
      }
    }
    val got = Metrics.aucByGroup(data.toDF("g", "s", "y"), "g", "s", "y")
      .select("g", "auc").as[(String, Double)].collect().toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val exp = bruteAuc(rows.map(r => (r._2, r._3))).get
      assert(math.abs(got(g) - exp) < 1e-12, s"group $g: ${got(g)} vs $exp")
    }
  }

  test("perfect, inverted, and degenerate separation") {
    val df = Seq(
      // all positives above all negatives -> AUC 1
      ("hi", 10L, true), ("hi", 11L, true), ("hi", 1L, false),
      // all positives below -> AUC 0
      ("lo", 1L, true), ("lo", 10L, false),
      // every score identical -> AUC 0.5
      ("tie", 5L, true), ("tie", 5L, false), ("tie", 5L, false),
      // one class only -> dropped
      ("onlypos", 3L, true)).toDF("g", "s", "y")
    val got = Metrics.aucByGroup(df, "g", "s", "y")
      .select("g", "auc").as[(String, Double)].collect().toMap
    assert(got == Map("hi" -> 1.0, "lo" -> 0.0, "tie" -> 0.5))
  }

  test("momentsByGroup == brute-force central moments; degenerate groups null out") {
    val rnd = new scala.util.Random(31)
    val data = (0 until 500).map(i => ("g" + (i % 2), rnd.nextInt(400).toLong + 50)) ++
      Seq.fill(5)(("flat", 7L))
    val got = Metrics.momentsByGroup(data.toDF("g", "v"), "g", "v")
      .select("g", "n", "mean_micro", "var_micro", "skew_micro", "kurt_micro")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val vs = rows.map(_._2.toDouble)
      val n = vs.size.toDouble
      val mean = vs.sum / n
      val m2 = vs.map(v => (v - mean) * (v - mean)).sum / n
      val (_, gn, gMean, gVar, gSkew, gKurt) = got(g)
      assert(gn == rows.size)
      assert(math.abs(gMean - math.round(mean * 1e6)) <= 1, s"$g mean")
      assert(math.abs(gVar - math.round(m2 * 1e6)) <= 1, s"$g var")
      if (m2 == 0) assert(gSkew.isEmpty && gKurt.isEmpty, s"$g degenerate")
      else {
        val m3 = vs.map(v => math.pow(v - mean, 3)).sum / n
        val m4 = vs.map(v => math.pow(v - mean, 4)).sum / n
        assert(math.abs(gSkew.get - math.round(m3 / math.pow(m2, 1.5) * 1e6)) <= 1, s"$g skew")
        assert(math.abs(gKurt.get - math.round((m4 / (m2 * m2) - 3.0) * 1e6)) <= 1, s"$g kurt")
      }
    }
  }

  test("null scores and labels are excluded") {
    val df = Seq(
      ("g", Some(2L), Some(true)), ("g", Some(1L), Some(false)),
      ("g", None, Some(true)), ("g", Some(9L), None)).toDF("g", "s", "y")
    val got = Metrics.aucByGroup(df, "g", "s", "y")
      .select("pos_n", "neg_n", "auc").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 1L, 1.0)))
  }

  test("profileColumns: exact counts, null handling, typed min/max") {
    val df = Seq[(java.lang.Long, String)](
      (3L, "b"), (1L, null), (10L, "a"), (null, "b"), (10L, "c"))
      .toDF("k", "s")
    val rows = Metrics.profileColumns(df, Seq("k", "s"))
      .orderBy("column").collect()
    assert(rows.length == 2)
    val k = rows(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 5 && k.getLong(2) == 1)
    assert(k.getLong(3) == 3) // distinct non-null: 1, 3, 10
    // min/max aggregate in LONG first (10 > 3 numerically; "10" < "3"
    // lexically — the order the operator must NOT use)
    assert(k.getString(4) == "1" && k.getString(5) == "10")
    val s = rows(1)
    assert(s.getString(0) == "s" && s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.getString(4) == "a" && s.getString(5) == "c")
  }
}
