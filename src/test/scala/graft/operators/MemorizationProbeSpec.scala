package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TextAnalysis.memorizationProbe]] — the substring-subset guarantee,
  * attribution, zero-hit handling, and the broadcast probe join. */
class MemorizationProbeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs said the sphinx"),
    (3L, "how vexingly quick daft zebras jump over fences at dawn")
  ).toDF("doc_id", "text")

  // prune disabled (maxDfFrac = 1.0): on a 3-doc corpus the default df
  // cap would prune any gram two docs share, which is not what these
  // functional tests exercise — the prune has its own test below
  private def probe(ps: (Long, String)*) =
    TextAnalysis.memorizationProbe(corpus, ps.toSeq.toDF("probe_id", "text"),
      maxDfFrac = 1.0)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("exact copy: hit_frac 1.0, attributed to its source") {
    val r = probe(10L -> "pack my box with five dozen liquor jugs said the sphinx")(10L)
    assert(r.getDouble(3) == 1.0)
    assert(r.getLong(4) == 2L)
    assert(r.getLong(5) == r.getLong(1), "top doc must share every fp")
  }

  test("interior substring: fingerprints are a subset of the source's") {
    val r = probe(11L -> "five dozen liquor jugs")(11L)
    assert(r.getDouble(3) == 1.0, s"interior excerpt must fully cover: $r")
    assert(r.getLong(4) == 2L)
  }

  test("novel text: zero hits, null attribution") {
    // gibberish sharing no normalized 5-gram with the corpus (a natural
    // sentence collides on common grams like " the ")
    val r = probe(12L -> "zzqqj xxwwk yyvvb qqppz mmnnr kkllt ggffh")(12L)
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("splice of two docs attributes to the larger contributor") {
    val r = probe(
      13L -> "the quick brown fox jumps over the lazy dog zzz at dawn")(13L)
    assert(r.getLong(4) == 1L, s"doc 1 contributes most fingerprints: $r")
    assert(r.getDouble(3) > 0.5 && r.getDouble(3) < 1.0)
  }

  test("df-prune drops boilerplate fingerprints and boilerplate-only probes") {
    // 10 docs sharing a header; unique tails. At maxDfFrac 0.2 the
    // header grams (df = 10 > 2) are boilerplate.
    val c = (0 until 10).map { i =>
      val t = ('a' + i).toChar.toString * 8
      (i.toLong, s"shared header boilerplate line $t $t")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.memorizationProbe(c,
      Seq((1L, "shared header boilerplate line"),
          (2L, "dddddddd dddddddd")).toDF("probe_id", "text"),
      maxDfFrac = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(1L), "boilerplate-only probe must be omitted")
    assert(out(2L).getDouble(3) == 1.0 && out(2L).getLong(4) == 3L,
      s"unique-tail probe must attribute to doc 3: ${out.get(2L)}")
  }

  test("probes with no fingerprints are omitted; probe batch broadcasts") {
    val out = TextAnalysis.memorizationProbe(corpus,
      Seq((14L, "ab"), (15L, "the quick brown fox")).toDF("probe_id", "text"),
      maxDfFrac = 1.0)
    assert(out.select("probe_id").as[Long].collect().toSeq == Seq(15L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join must broadcast the bounded probe side:\n$plan")
  }
}
