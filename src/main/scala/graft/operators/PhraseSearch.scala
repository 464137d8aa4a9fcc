package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search — exact token-sequence retrieval over a
  * positional inverted index, the IR primitive bag-of-words scoring
  * ([[TextAnalysis.bm25TopK]]) cannot express ("new york" is not
  * "york new").
  *
  * Plan: one row-local posexplode builds (doc, position, token)
  * postings; the phrase's FIRST token's postings anchor the candidate
  * set, and each subsequent token joins at `anchor position + i` —
  * k−1 equi-joins keyed on (doc, position), exactly the merge a native
  * positional index performs. The token equality filters sit UNDER the
  * joins, so only the phrase tokens' postings ever shuffle: cost is
  * Σ posting-list sizes of the phrase terms, never the corpus token
  * count — the selectivity argument that makes phrase queries cheap on
  * 100 TB (rare terms anchor tiny lists; a stopword-only phrase is the
  * worst case, as in every IR engine).
  *
  * Overlapping occurrences count individually (position-anchored), and
  * the occurrence count is emitted per matching document.
  */
object PhraseSearch {

  /** The positional posting table: one row per corpus token occurrence,
    * `(tok, did, pos)`. Row-local (one posexplode, no shuffle) — built
    * once and MATERIALIZED for repeated queries: persist it as an
    * engine stream (`Engine.createStream` + `appendRows`, the
    * index-as-stream pattern the HLL rollup tables use) and every
    * subsequent phrase query reads postings only, never the corpus
    * (round-6: the `phrase_search_indexed` gate + PhraseIndexSpec pin
    * the corpus-scan-free property on the file-scan level). At 100 TB
    * the index stream is the thing to bucket by `tok` so term lookups
    * prune to their buckets. */
  def buildPostings(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs
      .select(col(idCol).as("did"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .select("tok", "did", "pos")

  /** Phrase query over a PREBUILT `(tok, did, pos)` posting table (see
    * [[buildPostings]]): the phrase's first token's postings anchor the
    * candidate set, each subsequent token joins at `anchor position+i`.
    * Token filters sit UNDER the joins, so only the phrase terms'
    * posting lists shuffle — Σ posting sizes, never the corpus. */
  def phraseMatchesIndexed(postings: DataFrame, phrase: Seq[String],
                           idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val post = postings.select(col("did").as("__did"),
      col("pos").as("__pos"), col("tok").as("__tok"))
    val anchors = post.filter(col("__tok") === phrase.head)
      .select(col("__did"), col("__pos"))
    // merge-hinted: a token's filtered postings are estimated at
    // filter-selectivity × the (explode-blind, ~tokens-per-doc×
    // underestimated) posting size, so Catalyst happily broadcasts a
    // stop-word's corpus-sized posting list; SMJ keeps the documented
    // "Σ posting sizes shuffle, never the corpus" contract at any scale
    val matched = phrase.zipWithIndex.tail.foldLeft(anchors) {
      case (acc, (w, i)) =>
        acc.join(
          post.filter(col("__tok") === w)
            .select(col("__did"), (col("__pos") - i).as("__pos"))
            .hint("merge"),
          Seq("__did", "__pos"))
    }
    matched.groupBy(col("__did").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_matches"))
  }

  /** One-shot convenience: build the postings inline and query them —
    * for a single ad-hoc phrase; repeated queries should materialize
    * [[buildPostings]] once instead. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrase: Seq[String]): DataFrame =
    phraseMatchesIndexed(buildPostings(docs, idCol, textCol), phrase, idCol)
}
