package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the histogram-compressed median/MAD outlier filter:
  * the lower-median convention against a brute-force sort, duplicate
  * and null handling, the Hampel flag against a local recomputation,
  * and the MAD=0 degeneracy (everything off the modal value flags). */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def bruteLowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.length + 1) / 2 - 1)
  }

  test("lowerMedianByGroup == brute force on odd, even, and dup-heavy groups") {
    val data = Seq(
      ("odd", Seq(5L, 1L, 9L)),
      ("even", Seq(4L, 2L, 8L, 6L)),
      ("dups", Seq(3L, 3L, 3L, 7L, 7L)),
      ("one", Seq(42L)))
    val df = data.flatMap { case (g, xs) => xs.map(g -> _) }.toDF("g", "v")
    val got = Outliers.lowerMedianByGroup(df, "g", "v")
      .as[(String, Long)].collect().toMap
    data.foreach { case (g, xs) =>
      assert(got(g) == bruteLowerMedian(xs), s"group $g")
    }
  }

  test("null values are excluded; all-null groups drop out") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(5L)),
      ("b", None)).toDF("g", "v")
    val got = Outliers.lowerMedianByGroup(df, "g", "v")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L))
  }

  test("madOutliers == brute-force Hampel rule on a random frame") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val g = s"g${i % 5}"
      // mostly tight around a per-group center, a few wild points
      val base = 100L * (i % 5)
      val v = if (rnd.nextInt(50) == 0) base + rnd.nextInt(10000)
              else base + rnd.nextInt(21)
      (i.toLong, g, v)
    }
    val df = rows.toDF("id", "g", "v")
    val got = Outliers.madOutliers(df, "g", "v", k = 3)
      .select("id").as[Long].collect().toSet

    val expected = rows.groupBy(_._2).flatMap { case (_, grp) =>
      val med = bruteLowerMedian(grp.map(_._3))
      val mad = bruteLowerMedian(grp.map(r => math.abs(r._3 - med)))
      grp.filter(r => math.abs(r._3 - med) > 3L * mad).map(_._1)
    }.toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture should actually contain outliers")
  }

  test("winsorize == brute-force clip at exact rank bounds") {
    val rnd = new scala.util.Random(29)
    val rows = (0L until 800L).map(id =>
      (id, s"g${id % 3}", rnd.nextInt(1000).toLong))
    val got = Outliers.winsorize(rows.toDF("id", "g", "v"), "g", "v",
      tieCol = "id", pLoPct = 10, pHiPct = 90)
      .select("id", "winsorized").as[(Long, Long)].collect().toMap
    val expected = rows.groupBy(_._2).flatMap { case (_, grp) =>
      val sorted = grp.map(_._3).sorted
      val n = sorted.length
      val lo = sorted((10 * n + 99) / 100 - 1)
      val hi = sorted((90 * n + 99) / 100 - 1)
      grp.map(r => r._1 -> math.min(math.max(r._3, lo), hi))
    }
    assert(got == expected.toMap)
    // clipping must never drop rows
    assert(got.size == 800)
  }

  test("MAD=0 degeneracy: every row off the modal value flags") {
    val df = (Seq.fill(10)(5L) :+ 6L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    val got = Outliers.madOutliers(df, "g", "v", k = 3)
      .select("id", "v").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((10L, 6L)))
  }
}
