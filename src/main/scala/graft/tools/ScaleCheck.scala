package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Scale-behavior experiment (not a gate): replicate the sf0.1 documents
  * corpus K× with shifted ids and time the dedup candidate generators at
  * 1× vs K×, warm. The claim under test is the PLAN claim — banded
  * equi-joins keep candidate volume near-linear in corpus size (each
  * replica block collides within itself, not across the full cross
  * square). Results are recorded in PERF.md.
  *
  * `runMain graft.tools.ScaleCheck <sfDir> <K>`
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scalecheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val offset = 1000000L
    // K replicas with disjoint id ranges; texts repeat, so near-dup pairs
    // WITHIN a replica replicate K× and pairs ACROSS replicas add the
    // duplicated-content block — output grows ~K² per duplicated doc pair
    // ONLY for genuinely duplicated content, while candidate volume from
    // banding stays proportional to colliding content, not corpus²
    def replicated(n: Int): DataFrame =
      (0 until n).map(i => base.select(
        (col("doc_id") + lit(i * offset)).as("doc_id"), col("text")))
        .reduce(_ unionAll _)

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (n <- Seq(1, k)) {
      val docs = replicated(n).persist()
      val rows = docs.count()
      println(s"[scale] corpus x$n = $rows docs")
      // warmup pass at n=1 only (JIT/codegen)
      if (n == 1) { Dedup.minhashLsh(docs, "doc_id", "text", 2, 128, 32, 0.5).count() }
      val mh = time(s"minhash_lsh x$n")(
        Dedup.minhashLsh(docs, "doc_id", "text", 2, 128, 32, 0.5).count())
      println(s"[scale] minhash pairs x$n = $mh")
      val sh = time(s"simhash x$n")(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10).count())
      println(s"[scale] simhash pairs x$n = $sh")
      val nj = time(s"ngram_ppjoin x$n")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.3, queryPred = col("id") % 10 === 0).count())
      println(s"[scale] ngram pairs x$n = $nj")
      val ct = time(s"containment x$n")(
        Dedup.containmentPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.5, queryPred = col("id") % 10 === 0).count())
      println(s"[scale] containment pairs x$n = $ct")
      // corpus-linear diagnostics: cost must scale ~n (no pair terms at all)
      time(s"dup_ngram_frac x$n")(
        Dedup.dupNgramFraction(docs, "doc_id", "text", 4).count())
      time(s"boilerplate x$n")(
        graft.operators.TextAnalysis.removeBoilerplate(docs).count())
      time(s"mask_spans x$n")(
        Dedup.maskDuplicatedSpans(docs, "doc_id", "text", 8).count())
      docs.unpersist()
    }

    // ANN paths over a Kx embedding corpus: queries stay fixed (10), the
    // corpus grows — brute force must grow linearly, the bucketed paths
    // with corpus-side bucketing only (no pair blowup: top-k output is
    // fixed at |Q|·k regardless of corpus size)
    val embBase = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    def embReplicated(n: Int): DataFrame =
      (0 until n).map(i => embBase.select(
        (col("vec_id") + lit(i * offset)).as("vec_id"), col("embedding")))
        .reduce(_ unionAll _)
    import graft.operators.Similarity
    for (n <- Seq(1, k)) {
      val emb = embReplicated(n).persist()
      println(s"[scale] embeddings x$n = ${emb.count()} vecs")
      if (n == 1) { Similarity.lshTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, 5, 64, 6).count() }
      time(s"ann_brute x$n")(Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", col("vec_id") < 10, 5).count())
      time(s"ann_lsh x$n")(Similarity.lshTopK(
        emb, "vec_id", "embedding", col("vec_id") < 10, 5, 64, 6).count())
      time(s"ann_ivf x$n")(Similarity.ivfTopK(
        emb, "vec_id", "embedding", col("vec_id") < 10, 5, 16, 3).count())
      // SemDedup's honest scale story: cluster count grows WITH the
      // corpus (cells stay constant-sized, so the intra-cell pair join
      // stays corpus-linear) — fixed nCentroids at 10× would square the
      // within-cell comparisons instead
      time(s"semdedup x$n (centroids=${16 * n})")(Similarity.semDedup(
        emb, "vec_id", "embedding", nCentroids = 16 * n, threshold = 0.4).count())
      emb.unpersist()
    }
    spark.stop()
  }
}
