package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Vocab.bpeTrain]] / [[Vocab.bpeEncode]] — iterative BPE on a corpus
  * small enough to run by hand, pinning the two behaviors that are easy
  * to get silently wrong: leftmost-greedy pairing of ADJACENT
  * occurrences, and merged symbols participating in later merges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge ranks follow recounted pair frequencies, hand-checked") {
    // vocab: "aaab" ×3, "ab" ×2. Round-1 adjacent symbol pairs:
    //   "a a": 2 per "aaab" × 3 = 6;  "a b": 1×3 + 1×2 = 5  → merge (a,a).
    // Leftmost-greedy rewrite: "aaab" → [aa a b] (NOT [a aa b]).
    // Round 2: "aa a": 3, "a b": 3 (from aaab) + 2 (from ab) = 5
    //   → merge (a,b) with recounted cnt 5.
    val docs = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Vocab.bpeTrain(docs, k = 2)
    assert(merges.map(m => (m._1, m._2, m._3, m._4)) ==
      Seq((1, "a", "a", 6L), (2, "a", "b", 5L)))
  }

  test("encode applies the chain: counts match a hand replay") {
    val docs = Seq((1L, "xxxx xxx ab"), (2L, "ab ab x"))
      .toDF("doc_id", "text")
    // merge 1: (x,x) — "xxxx"→[xx xx]=2, "xxx"→[xx x]=2, "ab"→[a b]=2
    // merge 2 trained next would differ; here we APPLY a fixed chain:
    // (x,x) then (xx,xx): "xxxx"→[xxxx]=1, "xxx"→[xx x]=2, "ab"=2 syms
    val enc = Vocab.bpeEncode(docs, "doc_id", "text",
      Seq(("x", "x"), ("xx", "xx")))
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_symbols")
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc == Seq((1L, 3L, 1 + 2 + 2), (2L, 3L, 2 + 2 + 1)))
  }

  test("merged symbols participate in later merges (chain depth)") {
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    // (a,b) → [ab ab]; (ab,ab) → [abab]
    val enc = Vocab.bpeEncode(docs, "doc_id", "text",
      Seq(("a", "b"), ("ab", "ab")))
      .select("n_symbols").as[Long].head()
    assert(enc == 2L) // two words, each one symbol
  }

  test("single-char and empty-ish words survive") {
    val docs = Seq((1L, "a bb a")).toDF("doc_id", "text")
    val enc = Vocab.bpeEncode(docs, "doc_id", "text", Seq(("b", "b")))
      .select("n_words", "n_symbols").as[(Long, Long)].head()
    assert(enc == ((3L, 3L))) // a=1, bb=1 (merged), a=1
  }

  test("fertility rolls up per language in exact floor-division micros") {
    val docs = Seq(
      (1L, "en", "ab ab"),   // (a,b) merged: 2 words, 2 symbols
      (2L, "en", "abc"),     // [ab c] = 2 symbols
      (3L, "de", "xyz xyz")  // unmerged: 2 words, 6 symbols
    ).toDF("doc_id", "lang", "text")
    val got = Vocab.bpeFertility(docs, "doc_id", "text", "lang",
      Seq(("a", "b")))
      .orderBy("lang")
      .as[(String, Long, Long, Long)].collect().toSeq
    // en: 3 words, 4 symbols → 4e6 div 3 = 1333333 (floor, not round)
    assert(got == Seq(
      ("de", 2L, 6L, 3000000L),
      ("en", 3L, 4L, 1333333L)))
  }
}
