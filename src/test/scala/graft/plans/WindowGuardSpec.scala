package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ranks

/** [[SinglePartitionWindowGuard]] — the optimizer-injected scale lint:
  * flags corpus-wide single-partition windows, stays silent on
  * partitioned windows, bounded (aggregate/limit/local) inputs, and the
  * library's own bucketed-rank pattern. The suite session registers the
  * rule through `spark.sql.extensions=graft.GraftExtensions`, so these
  * tests also prove the injection path end-to-end. */
class WindowGuardSpec extends SparkSpec {

  private def withMode[T](mode: String)(f: => T): T = {
    spark.conf.set(SinglePartitionWindowGuard.ModeKey, mode)
    try f finally spark.conf.set(SinglePartitionWindowGuard.ModeKey, "off")
  }

  private def corpus = spark.range(10000).select(
    col("id"), (col("id") % 97).as("v"))

  private def flagged(f: => org.apache.spark.sql.DataFrame): Boolean =
    try { f.collect(); false }
    catch {
      case e: Throwable =>
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.getMessage).filter(_ != null).toSeq
        if (msgs.exists(_.contains("single-partition Window"))) true
        else throw e
    }

  test("fail mode flags a corpus-wide ntile with no PARTITION BY") {
    withMode("fail") {
      assert(flagged(corpus.withColumn("t",
        ntile(10).over(Window.orderBy(col("v"), col("id"))))))
    }
  }

  test("partitioned windows pass") {
    withMode("fail") {
      assert(!flagged(corpus.withColumn("r",
        row_number().over(Window.partitionBy(col("v")).orderBy(col("id"))))))
    }
  }

  test("grouped aggregate below a global window FLAGS (round-6 tightening)") {
    withMode("fail") {
      // groupBy(doc_id)-style per-key aggregates are corpus-sized — the
      // old blanket Aggregate exemption was a false-negative surface
      assert(flagged(corpus.groupBy("v").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("v"))))))
    }
  }

  test("GLOBAL aggregate (1 row) below a window passes") {
    withMode("fail") {
      assert(!flagged(corpus.agg(count(lit(1)).as("n"), sum("v").as("s"))
        .withColumn("rk", row_number().over(Window.orderBy(col("n"))))))
    }
  }

  test("the __graft_bkt offset-ladder aggregate stays exempt") {
    withMode("fail") {
      assert(!flagged(corpus.withColumn("__graft_bkt", col("v") % 8)
        .groupBy("__graft_bkt").agg(count(lit(1)).as("n"))
        .withColumn("off", sum(col("n")).over(
          Window.orderBy(col("__graft_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)))))
    }
  }

  test("rank-limit through a cast alias chain stays exempt") {
    withMode("fail") {
      // withColumn("rn", row_number().over(w).cast("long")) puts a
      // Project alias between the Filter and the window output — the
      // attribute tracking must see through it (the Vocab top-k shape)
      assert(!flagged(corpus.withColumn("rn",
        row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
        .filter(col("rn") <= 10)))
    }
  }

  test("an UNRELATED literal filter above a rank window no longer exempts") {
    withMode("fail") {
      // round-5 advice: `v > 3` bounds nothing about the global rank
      assert(flagged(corpus.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))))
        .filter(col("v") > 3)))
    }
  }

  test("agg joined back to the corpus then windowed IS flagged (not bounded)") {
    withMode("fail") {
      val dim = corpus.groupBy("v").agg(count(lit(1)).as("n"))
      assert(flagged(corpus.join(dim, "v").withColumn("rk",
        row_number().over(Window.orderBy(col("id"))))))
    }
  }

  test("Ranks.globalRowNumber passes under fail mode (the prescribed alternative)") {
    withMode("fail") {
      val out = Ranks.globalRowNumber(corpus, "v", "id")
      assert(out.count() === 10000L)
    }
  }

  test("top-k rank-limit idiom is exempt: Spark bounds it via rank-limit pushdown") {
    withMode("fail") {
      // row_number + rn <= k: physically plans TakeOrderedAndProject +
      // a <=k-row window — flagging it would be a false positive (found
      // empirically on the weighted_sample gate before the exemption)
      assert(!flagged(corpus.withColumn("rn",
        row_number().over(Window.orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= 10)))
      // the library's own WRS sampler is that exact shape
      val q = graft.Queries.all.find(_.name == "weighted_sample").get
      assert(q.fn(spark, "/root/testdata/sf0.001").count() > 0)
    }
  }

  test("rank window WITHOUT a bounding filter still flags") {
    withMode("fail") {
      assert(flagged(corpus.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))))))
    }
  }

  test("default mode is off: corpus-wide window runs unflagged") {
    // no conf set — the same plan that fails above must execute
    val n = corpus.withColumn("t",
      ntile(10).over(Window.orderBy(col("v"), col("id")))).count()
    assert(n === 10000L)
  }
}
