package graft.operators

import org.apache.spark.sql.execution.SparkPlan

import graft.SparkSpec

/** Vocabulary / tokenizer-training operators: BPE merge-candidate counts
  * and per-group tf·idf terms. */
class VocabSpec extends SparkSpec {

  import spark.implicits._

  test("bpeMergeCandidates counts adjacent char pairs weighted by occurrence") {
    val docs = Seq(
      "aba ab",   // aba -> ab, ba ; ab -> ab
      "ab x",     // ab -> ab ; x too short
      "ba").toDF("text")
    val got = Vocab.bpeMergeCandidates(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ab appears 3x (aba, ab, ab), ba 2x (aba, ba)
    assert(got.toSeq == Seq(("ab", 3L, 1L), ("ba", 2L, 2L)))
  }

  test("bpeMergeCandidates ties rank deterministically by pair") {
    val docs = Seq("cd ef cd ef").toDF("text")
    val got = Vocab.bpeMergeCandidates(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("cd", 2L, 1L), ("ef", 2L, 2L)))
  }

  test("tfidfTerms scores group-local terms above corpus-wide ones") {
    val docs = Seq(
      (0L, "common rare0", "s0"),
      (1L, "common rare0", "s0"),
      (2L, "common rare1", "s1"),
      (3L, "common other", "s1")).toDF("doc_id", "text", "source")
    val got = Vocab.tfidfTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    // 'common' has df=4=N → idf 0 → tfidf 0, so it can never rank first;
    // the group-local rare terms lead every group
    assert(got.filter(_._3 == 1L).map(_._2).forall(_ != "common"))
    assert(got.filter(_._1 == "s0").minBy(_._3)._2 == "rare0")
    assert(got.filter(_._1 == "s1").map(_._2).toSet == Set("rare1", "other"))
  }

  test("plan shape: no cartesian products beyond the 1-row N broadcast") {
    val docs = Seq((0L, "a b c", "s0")).toDF("doc_id", "text", "source")
    val plan: SparkPlan = Vocab.tfidfTerms(docs).queryExecution.executedPlan
    val cart = plan.collect {
      case p if p.nodeName.contains("CartesianProduct") => p
    }
    assert(cart.isEmpty, "tf·idf must join on word; only the 1-row N " +
      "aggregate may broadcast (BroadcastNestedLoopJoin), never a cartesian")
  }
}
