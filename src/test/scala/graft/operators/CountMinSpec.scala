package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sketches]] count-min family — the merge/update laws that make the
  * frequency-sketch table safe to persist, the one-sided error
  * guarantee, and the broadcast shape of the probe join. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish token stream: token t appears ~N/(t+1) times across 5 sources
  private def toks = spark.range(60000).select(
    (col("id") % 5).cast("string").as("source"),
    concat(lit("tok"), (col("id") % 500) * (col("id") % 500) % 700)
      .as("word"))

  test("cmSlot: exact Scala replay of the cell index") {
    val got = toks.limit(1).select(col("word"),
      Sketches.cmSlot(col("word"), 2, 1024)).as[(String, Long)].head()
    val exp = math.floorMod(CrossHash.scalaHash56(s"cm:2:${got._1}"), 1024L)
    assert(got._2 == exp)
  }

  test("merge law: union of shard sketches == whole-corpus sketch, cell-exact") {
    val whole = Sketches.mergeCountMin(
      Sketches.countMinSketch(toks, Seq("source"), "word"), Seq("source"))
    val sharded = toks.withColumn("shard", pmod(xxhash64(col("word")), lit(4)))
    val viaShards = Sketches.mergeCountMin(
      Sketches.countMinSketch(sharded, Seq("source", "shard"), "word"),
      Seq("source"))
    assert(whole.exceptAll(viaShards).isEmpty &&
      viaShards.exceptAll(whole).isEmpty,
      "entrywise-sum merge must be partition independent")
  }

  test("updateCountMin: micro-batch maintained table == one-shot batch table") {
    val a = toks.filter(col("id") % 3 =!= 0).drop("id")
    val b = toks.filter(col("id") % 3 === 0).drop("id")
    val standing = Sketches.countMinSketch(a, Seq("source"), "word")
    val maintained = Sketches.updateCountMin(standing, b, Seq("source"), "word")
    val batch = Sketches.mergeCountMin(
      Sketches.countMinSketch(toks, Seq("source"), "word"), Seq("source"))
    assert(maintained.exceptAll(batch).isEmpty &&
      batch.exceptAll(maintained).isEmpty)
  }

  test("one-sided error: est >= exact for every item; exact at collision-free width") {
    val exact = toks.groupBy("source", "word").agg(count(lit(1)).as("n"))
    val items = exact.select("source", "word")
    // narrow sketch: collisions guaranteed, but never an undercount
    val narrow = Sketches.cmEstimate(
      Sketches.countMinSketch(toks, Seq("source"), "word", width = 64),
      items, Seq("source"), "word", width = 64)
      .join(exact, Seq("source", "word"))
    assert(narrow.filter(col("est") < col("n")).isEmpty,
      "count-min must never under-count")
    assert(narrow.filter(col("est") > col("n")).count() > 0,
      "width=64 over ~700 tokens should collide somewhere")
    // wide sketch: ~700 distinct tokens in 2^20 slots x 3 rows — the
    // min over rows is collision-free w.h.p. and equals exact
    val wide = Sketches.cmEstimate(
      Sketches.countMinSketch(toks, Seq("source"), "word", width = 1 << 20),
      items, Seq("source"), "word", width = 1 << 20)
      .join(exact, Seq("source", "word"))
    assert(wide.filter(col("est") =!= col("n")).isEmpty)
  }

  test("unseen items estimate from empty cells (>= 0, no join loss)") {
    val sk = Sketches.countMinSketch(toks, Seq("source"), "word",
      width = 1 << 20)
    val ghosts = Seq(("0", "never-seen-a"), ("3", "never-seen-b"))
      .toDF("source", "word")
    val est = Sketches.cmEstimate(sk, ghosts, Seq("source"), "word",
      width = 1 << 20)
    assert(est.count() == 2)
    assert(est.filter(col("est") =!= 0L).isEmpty,
      "collision-free ghosts must estimate 0")
  }

  test("probe join broadcasts the sketch (corpus-size-independent side)") {
    val sk = Sketches.countMinSketch(toks, Seq("source"), "word")
    val plan = Sketches.cmEstimate(sk, toks.select("source", "word").distinct(),
      Seq("source"), "word")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch probe must be a broadcast join:\n$plan")
  }
}
