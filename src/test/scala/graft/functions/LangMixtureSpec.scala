package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis

/** [[LangMixtureCounts]] — the fused kernel must equal the
  * regex-in-lambda formulation (= the DuckDB oracle semantics) on every
  * input, ESPECIALLY the regex's non-overlapping quirks: a run of k
  * adjacent identical marker tokens counts ⌈k/2⌉ (the match consumes
  * the trailing space), and a doubled space re-arms the boundary. */
class LangMixtureSpec extends SparkSpec {
  import spark.implicits._

  private def diff(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = TextAnalysis.langMixture(df).collect()
      .map(_.toString).sorted.toSeq
    val regex = TextAnalysis.langMixtureRegex(df).collect()
      .map(_.toString).sorted.toSeq
    assert(fused == regex,
      s"kernel diverges from the regex formulation on: $texts")
  }

  test("hand-picked adjacency and boundary edges") {
    diff(Seq(
      "the the",                 // run of 2 → 1 (consumed boundary)
      "the the the",             // run of 3 → 2
      "the the the the",         // run of 4 → 2
      "the  the",                // doubled space breaks the run → 2
      "und und ist",             // cross-word adjacency: independent passes
      "der. le! el? the",        // one segment per language
      "THE AND of IS",           // lowercase applies before matching
      " . ! ? ",                 // only empty segments
      "",                        // empty doc
      "xyz abc",                 // no markers → und segment
      "the und",                 // tie: first language (en) wins
      "the. the.. the",          // empty segment between delimiters
      "  the   and  ",           // leading/trailing/multi spaces
      "est est est est est",     // run of 5 → 3
      "y y y",                   // single-char marker runs
      "的 和 是 了",             // non-ASCII markers
      "the.and!of?is"))          // delimiters without spaces
  }

  test("fuzz: random marker/noise token streams") {
    val words = Array("the", "and", "der", "und", "le", "est", "el", "y",
      "的", "x", "zz", "", " ")
    val rnd = new scala.util.Random(20260814)
    val texts = (1 to 300).map { _ =>
      (0 until rnd.nextInt(30)).map { _ =>
        val w = words(rnd.nextInt(words.length))
        if (rnd.nextInt(8) == 0) w + "." else w
      }.mkString(" ")
    }
    diff(texts)
  }

  test("fuzz: synthetic corpus rows with injected code-switching") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    import org.apache.spark.sql.functions._
    val synth = docs.limit(200).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(". Der und ist die und der."))
          .otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit(". Le et la est le."))
          .otherwise(lit(""))).as("text"))
    val fused = TextAnalysis.langMixture(synth).collect()
      .map(_.toString).sorted.toSeq
    val regex = TextAnalysis.langMixtureRegex(synth).collect()
      .map(_.toString).sorted.toSeq
    assert(fused == regex)
  }
}
