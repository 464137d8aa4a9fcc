package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed per-group rank against the window function it replaces,
  * including ties, nulls, skewed groups, and the buckets=1 degenerate
  * path; plus the exact-proportion contract of stratifiedSplit. */
class GroupedRankSpec extends SparkSpec {
  import spark.implicits._

  test("groupedRowNumber == row_number() OVER (PARTITION BY g ORDER BY v, id)") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 3000L).map { id =>
      val g = s"g${rnd.nextInt(4)}"
      val v: Option[Long] =
        if (rnd.nextInt(40) == 0) None else Some(rnd.nextInt(50).toLong)
      (id, g, v)
    }
    val df = rows.toDF("id", "g", "v")
    for (buckets <- Seq(1, 8)) {
      val got = Ranks.groupedRowNumber(df, "g", "v", "id", buckets = buckets)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      val exp = df.withColumn("rank",
        row_number().over(Window.partitionBy("g").orderBy("v", "id"))
          .cast("long"))
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got == exp, s"buckets=$buckets")
    }
  }

  test("skewed groups: one giant group, many singletons") {
    val rows = (0L until 2000L).map(id => (id, "big", id % 3)) ++
      (2000L until 2050L).map(id => (id, s"solo$id", 0L))
    val df = rows.toDF("id", "g", "v")
    val got = Ranks.groupedRowNumber(df, "g", "v", "id")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val exp = df.withColumn("rank",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got == exp)
  }

  test("stratifiedSplit hits exact floor proportions per stratum") {
    val rows = (0L until 1000L).map(id => (id, s"s${id % 3}"))
    val df = rows.toDF("id", "stratum")
    val out = Sampling.stratifiedSplit(df, "id", "stratum",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "x")
    val counts = out.groupBy("stratum", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (st, sp, n) => (st, sp) -> n }.toMap
    // strata sizes: 334, 333, 333
    for ((st, n) <- Seq("s0" -> 334L, "s1" -> 333L, "s2" -> 333L)) {
      val train = n * 80 / 100
      val valN = n * 90 / 100 - train
      val test = n - n * 90 / 100
      assert(counts((st, "train")) == train, s"$st train")
      assert(counts((st, "val")) == valN, s"$st val")
      assert(counts((st, "test")) == test, s"$st test")
    }
    // every input row assigned exactly once
    assert(out.count() == 1000)
  }

  test("systematicSample keeps exactly ceil(n/k) rows, k=1 keeps all") {
    val df = (0L until 1003L).map(id => (id, s"x$id")).toDF("id", "payload")
    val got = Sampling.systematicSample(df, "id", k = 7, salt = "z")
    assert(got.count() == (1003 + 6) / 7)
    assert(got.columns.toSeq == Seq("id", "payload"))
    assert(Sampling.systematicSample(df, "id", k = 1, salt = "z").count() == 1003)
  }

  test("distributionMatchSample matches the target marginal; clamps to pool") {
    // target: 60% bucket A, 40% bucket B; pool has plenty of A, only 3 B
    val target = (0 until 60).map(i => (i.toLong, "A")) ++
      (60 until 100).map(i => (i.toLong, "B"))
    val pool = (1000L until 1200L).map(id => (id, "A")) ++
      Seq((2000L, "B"), (2001L, "B"), (2002L, "B"))
    val got = Sampling.distributionMatchSample(
      pool.toDF("id", "bkt"), target.toDF("id", "bkt"), "id", "bkt",
      m = 50, salt = "t")
      .select("id", "bkt").as[(Long, String)].collect()
    val byBkt = got.groupBy(_._2).map { case (b, rs) => b -> rs.length }
    // quota A = 60*50/100 = 30; quota B = 40*50/100 = 20 clamped to 3
    assert(byBkt == Map("A" -> 30, "B" -> 3))
    // deterministic draw
    val again = Sampling.distributionMatchSample(
      pool.toDF("id", "bkt"), target.toDF("id", "bkt"), "id", "bkt",
      m = 50, salt = "t")
      .select("id", "bkt").as[(Long, String)].collect()
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("stratifiedSplit is deterministic and salt-sensitive") {
    val df = (0L until 300L).map(id => (id, s"s${id % 2}")).toDF("id", "stratum")
    def assign(salt: String) =
      Sampling.stratifiedSplit(df, "id", "stratum",
        Seq("a" -> 50, "b" -> 50), salt)
        .select("id", "split").as[(Long, String)].collect().toMap
    assert(assign("p") == assign("p"))
    assert(assign("p") != assign("q"))
  }
}
