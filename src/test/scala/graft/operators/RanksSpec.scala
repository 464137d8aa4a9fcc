package graft.operators

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed global rank vs the single-window definition, and quantile
  * normalization vs a plain-Scala model.
  */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  test("globalRowNumber == row_number over the global window, any bucket count") {
    val rnd = new Random(31)
    for (trial <- 0 until 6) {
      // heavy duplication so ties straddle would-be bucket boundaries
      val rows = (0 until 500).map(i => (i.toLong, rnd.nextInt(20).toLong))
      val df = rows.toDF("id", "v")
      val expected = df.withColumn("rank",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      for (buckets <- Seq(1, 4, 64, 1000)) {
        val got = Ranks.globalRowNumber(df, "v", "id", buckets)
          .select("id", "rank").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"trial $trial buckets=$buckets")
      }
    }
  }

  test("globalRowNumber plans no corpus-wide single-partition window") {
    val df = (0 until 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val plan = Ranks.globalRowNumber(df, "v", "id", 8)
      .queryExecution.executedPlan.toString
    // the corpus window must be partitioned by the bucket; the only
    // unpartitioned window allowed is the ≤buckets-row offset cumsum
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, s"no Window nodes found:\n$plan")
    // the offset cumsum (sum over the ≤buckets-row per-bucket counts) is
    // the only window allowed without a partition spec; the corpus-sized
    // row_number window must be partitioned by the bucket column
    val (offsetWs, corpusWs) =
      windowLines.partition(_.contains("sum(__graft_n"))
    assert(corpusWs.nonEmpty, s"corpus row_number window missing:\n$plan")
    corpusWs.foreach { l =>
      // WindowExec prints `..., [<partitionSpec>], [<orderSpec>]`; the
      // corpus-sized window's partition spec must be the bucket column
      assert("\\], \\[__graft_bkt#\\d+\\], \\[".r.findFirstIn(l).isDefined,
        s"corpus window not partitioned by __graft_bkt: $l")
    }
    assert(offsetWs.size <= 1,
      s"more than one offset-cumsum window:\n${offsetWs.mkString("\n")}")
  }

  test("globalRowNumber ranks null values first, matching the window oracle") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (2L, 5L), (3L, null), (4L, 1L), (5L, 3L))
      .toDF("id", "v")
    val expected = df.withColumn("rank",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (buckets <- Seq(1, 4)) {
      val got = Ranks.globalRowNumber(df, "v", "id", buckets)
        .select("id", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"buckets=$buckets")
    }
  }

  test("ntileFromRank == Spark's ntile window for every (n, k) shape") {
    val rnd = new Random(37)
    for (trial <- 0 until 12) {
      val n = 1 + rnd.nextInt(40) // incl. n < k shapes
      val k = 1 + rnd.nextInt(9)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(10).toLong))
      val df = rows.toDF("id", "v")
      val expected = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val ranked = Ranks.globalRowNumber(df, "v", "id", 4, outCol = "rk")
      val total = df.agg(count(lit(1)).as("n"))
      val got = ranked.crossJoin(broadcast(total))
        .select(col("id"),
          Ranks.ntileFromRank(col("rk"), col("n"), k).as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial n=$n k=$k")
    }
  }

  test("quantileNormalize maps each group onto the global distribution") {
    val rnd = new Random(41)
    // three sources with very different scales
    val rows = (0 until 300).map { i =>
      val src = i % 3
      val v = src match {
        case 0 => rnd.nextInt(10).toLong        // small
        case 1 => 100L + rnd.nextInt(50)        // mid
        case _ => 10000L + rnd.nextInt(1000)    // large
      }
      (i.toLong, s"s$src", v)
    }
    // plain-Scala model of the same mapping
    val sortedAll = rows.sortBy(r => (r._3, r._1)).map(_._3).toVector
    val n = sortedAll.size
    val expected = rows.groupBy(_._2).values.flatMap { grp =>
      val sorted = grp.sortBy(r => (r._3, r._1))
      val ng = sorted.size
      sorted.zipWithIndex.map { case (r, i) =>
        val pr = if (ng == 1) 0.0 else i * 1.0 / (ng - 1)
        r._1 -> sortedAll(math.floor(pr * (n - 1)).toInt)
      }
    }.toMap
    val got = Ranks.quantileNormalize(rows.toDF("id", "src", "v"),
      "src", "v", "id")
      .select("id", "norm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // the normalized values of each group now span the global range:
    // minima map to the global minimum, maxima to the global maximum
    val bySrc = rows.groupBy(_._2)
    bySrc.keys.foreach { s =>
      val ids = bySrc(s).map(_._1).toSet
      val vals = got.filter(kv => ids(kv._1)).values
      assert(vals.min === sortedAll.head, s"$s min")
      assert(vals.max === sortedAll.last, s"$s max")
    }
  }

  test("skewProfile: uniform keys gini 0; hand-checked skew; nulls dropped") {
    import spark.implicits._
    // uniform: 3 keys x 2 rows
    val uni = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    val u = Ranks.skewProfile(uni, "k")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(u == ((3L, 6L, 2L, 1000000L, 0L)))
    // skewed: counts [1,1,1,9] -> gini 24/(4*12)=0.5, max/mean=3
    val sk = (Seq.fill(9)("hot") ++ Seq("x", "y", "z") ++
      Seq(null.asInstanceOf[String])).toDF("k")
    val g = Ranks.skewProfile(sk, "k")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(g == ((4L, 12L, 9L, 3000000L, 500000L)))
  }

  test("refIntegrity: orphans, null keys, and the clean case, hand-checked") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Metrics.refIntegrity(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long, Long, Long)].head()
    // 5 rows, 1 null, orphans = the two 9s; 2e6/4 = 500000
    assert(got == (("c->p", 5L, 1L, 2L, 500000L)))
    val clean = Metrics.refIntegrity(
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk", "ok")
      .as[(String, Long, Long, Long, Long)].head()
    assert(clean == (("ok", 2L, 0L, 0L, 0L)))
  }

  test("skyline2D equals the brute-force dominance filter, any bucket count") {
    import spark.implicits._
    val pts = (0 until 800).map { i =>
      (i.toLong, (i * 37 % 211).toLong, (i * 53 % 197).toLong)
    }
    val df = pts.toDF("id", "x", "y")
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet
    for (b <- Seq(1, 4, 64)) {
      val got = Ranks.skyline2D(df, "x", "y", buckets = b)
        .select("id").as[Long].collect().toSet
      assert(got == brute, s"buckets=$b: $got != $brute")
    }
  }

  test("skyline2D keeps duplicate frontier points and is null-safe") {
    import spark.implicits._
    val df = Seq((1L, Some(5L), Some(5L)), (2L, Some(5L), Some(5L)),
      (3L, Some(9L), Some(1L)), (4L, Some(1L), Some(9L)),
      (5L, Some(4L), Some(4L)), (6L, None, Some(7L)), (7L, Some(7L), None))
      .toDF("id", "x", "y")
    val got = Ranks.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    // (5,5) twice (equal points don't dominate), plus both extremes;
    // (4,4) dominated; null rows never join the frontier
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("lengthBucketBatches: batches cut in length order, waste hand-checked") {
    import spark.implicits._
    // bucket 0 (<=10): lens 1..5, batchSize 2 → batches [1,2],[3,4],[5]
    // bucket 1 (>10): lens 20,20 → one batch, zero waste
    val docs = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L),
      (6L, 20L), (7L, 20L)).toDF("doc_id", "len")
    val got = Ranks.lengthBucketBatches(docs, "doc_id", "len",
      edges = Seq(10L), batchSize = 2)
      .orderBy("bucket", "batch")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0, 0L, 2L, 2L, 3L, 250000L),  // pad 2·2−3=1 of 4 → 0.25
      (0, 1L, 2L, 4L, 7L, 125000L),  // 8−7=1 of 8
      (0, 2L, 1L, 5L, 5L, 0L),
      (1, 0L, 2L, 20L, 40L, 0L)))
  }

  test("entropyRate: deterministic chain 0; fair coin ln2; brute replay") {
    import spark.implicits._
    // deterministic: every context has one successor → H = 0
    val det = Seq(("s", "a b a b a b")).toDF("source", "text")
    val hd = Metrics.entropyRate(det, "source")
      .as[(String, Long, Long)].head()
    assert(hd == (("s", 5L, 0L)))
    // fair coin after 'a': "a x a y" repeated → successors of 'a' split
    // evenly between x and y, x/y always return to a → H weighted:
    // contexts a (p .5, H ln2), x (p .25, H 0), y (p .25, H 0)
    val coin = Seq(("s", Seq.fill(50)("a x a y").mkString(" ")))
      .toDF("source", "text")
    val hc = Metrics.entropyRate(coin, "source")
      .as[(String, Long, Long)].head()
    // brute replay with the same early-rounded micro logs
    val toks = Seq.fill(50)("a x a y").mkString(" ").split(" ").toSeq
    val pairs = toks.zip(toks.tail).groupBy(identity).map { case (k, g) =>
      k -> g.size.toLong }
    val ctx = pairs.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val n = pairs.values.sum
    val num = pairs.map { case ((w1, _), c12) =>
      c12 * math.round(math.log(c12.toDouble / ctx(w1)) * 1e6)
    }.sum
    assert(hc == (("s", n, (-BigInt(num)).toLong / n)))
  }

  test("associationAudit: independent table ~0; deterministic pairing maximal") {
    import spark.implicits._
    // perfectly independent 2x2: every cell o=25, ra=cb=50, N=100 → G=0
    val ind = (0 until 100).map(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val gi = Metrics.associationAudit(ind, "x", "y")
      .as[(Long, Long, Long)].head()
    assert(gi == ((100L, 0L, 0L)))
    // x determines y: MI = H(x) = ln 2 nats → 693147 micros
    val det = (0 until 100).map(i => (s"a${i % 2}", s"b${i % 2}"))
      .toDF("x", "y")
    val gd = Metrics.associationAudit(det, "x", "y")
      .as[(Long, Long, Long)].head()
    // per cell lp = round(ln2·1e6) = 693147; Σo·lp = 100·693147;
    // G = 2·Σo·lp, MI = Σo·lp/N
    assert(gd == ((100L, 138629400L, 693147L)),
      s"deterministic 2-class pairing: G=2N·ln2, MI=ln2 micros, got $gd")
  }

  test("skewProfile matches a brute Gini on random counts (tie invariance)") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => s"k${(i * i + 7) % 223}")
    val got = Ranks.skewProfile(rows.toDF("k"), "k")
      .as[(Long, Long, Long, Long, Long)].head()
    val counts = rows.groupBy(identity).map(_._2.size.toLong).toSeq.sorted
    val n = counts.size.toLong
    val tot = counts.sum
    val gnum = counts.zipWithIndex
      .map { case (c, i) => (2L * (i + 1) - n - 1) * c }.sum
    assert(got._1 == n && got._2 == tot && got._3 == counts.max)
    assert(got._5 == BigInt(gnum) * 1000000 / (BigInt(n) * tot))
  }
}
