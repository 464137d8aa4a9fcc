package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Engine
import graft.schema.StreamSchema

/** [[PhraseSearch]] materialized positional index (round 6): postings
  * persisted as an engine stream answer repeated phrase queries WITHOUT
  * rescanning the corpus — pinned at the file-scan level by walking the
  * executed plan's scanned file paths. */
class PhraseIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpusDir = "/root/testdata/sf0.001/documents.parquet"

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // force execution so AQE finalizes the plan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan) // stage wrappers have no children
      case r: ReusedExchangeExec => walk(r.child)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
      case other => other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("repeat phrase queries read the persisted index only — never the corpus") {
    val docs = spark.read.parquet(corpusDir).filter(col("text").isNotNull)
    val e = new Engine(spark, tmpDir("graft-phrase-index"))

    val postings = PhraseSearch.buildPostings(docs, "doc_id", "text")
    e.createStream("postings", StreamSchema.fromStruct(postings.schema))
    e.appendRows("postings", postings) // the one corpus scan (index build)

    val idx = e.readStream("postings")
    val direct = PhraseSearch
      .phraseMatches(docs, "doc_id", "text", Seq("stream", "table"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = PhraseSearch
      .phraseMatchesIndexed(idx, Seq("stream", "table"))
    val got = indexed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == direct, s"indexed != direct: ${got.diff(direct)} / ${direct.diff(got)}")

    // the scan-free contract: every file scan of the indexed query is
    // under the engine stream's directory; the corpus parquet appears
    // in ZERO of them — and the same holds for a SECOND phrase (the
    // repeat-query case the index exists for)
    Seq(Seq("stream", "table"), Seq("hash", "join")).foreach { phrase =>
      val paths = scannedPaths(PhraseSearch.phraseMatchesIndexed(idx, phrase))
      assert(paths.nonEmpty)
      assert(paths.forall(_.contains(e.catalog.dataPath("postings"))),
        s"unexpected scan outside the index: $paths")
      assert(!paths.exists(_.contains("documents.parquet")),
        s"corpus rescanned by an indexed query: $paths")
    }
  }

  test("overlapping occurrences and multi-hit docs count identically to the inline path") {
    val docs = Seq(
      (1L, "a b a b a"), // 'a b' twice, overlapping window safe
      (2L, "a b"),
      (3L, "b a b")).toDF("doc_id", "text")
    val post = PhraseSearch.buildPostings(docs, "doc_id", "text")
    val viaIndex = PhraseSearch.phraseMatchesIndexed(post, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaIndex == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
