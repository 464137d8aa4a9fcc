package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every document across two corpus
  * versions as `added` / `removed` / `modified` / `unchanged` — the
  * operational primitive behind incremental crawl updates ("process only
  * what changed since the last snapshot"), retraining-set audits, and
  * the reference's own has-changed materialization diff
  * (impl.py-equivalent semantics at corpus granularity instead of SQL
  * text granularity).
  *
  * Scale shape: both sides reduce to `(id, 16-byte content hash)`
  * BEFORE the join — the full outer join shuffles 24 B/row, never
  * document text (the [[Dedup.exactByHash]] rationale; an md5 collision
  * misclassifying a modified doc as unchanged is ~2⁻¹²⁸). One shuffle
  * per side, classification is a row-local CASE on null-ness +
  * hash equality. At 100 TB the diff costs what two column-pruned scans
  * cost.
  */
object CorpusDiff {

  /** Reserved digest for NULL column values: not producible by md5 of
    * any input (up to the same 2^-128 as any collision), so NULL and ''
    * hash differently. */
  private val NullDigest = "0" * 32

  /** @return one row per id present in EITHER version:
    *         (id, status ∈ added|removed|modified|unchanged) */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff requires at least one content column")
    // hash each column SEPARATELY, then hash the fixed-width digest
    // concatenation: a separator-based concat of raw values still lets a
    // value CONTAINING the separator shift column boundaries; per-column
    // digests close that channel entirely, and the reserved NullDigest
    // keeps NULL distinct from '' (review finding)
    def keyed(df: DataFrame, hashAs: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws("", contentCols.map(c =>
          when(col(c).isNull, lit(NullDigest))
            .otherwise(md5(col(c).cast("string")))): _*)).as(hashAs))
    keyed(v1, "__h1").join(keyed(v2, "__h2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h1").isNull, "added")
          .when(col("__h2").isNull, "removed")
          .when(col("__h1") === col("__h2"), "unchanged")
          .otherwise("modified").as("status"))
  }

  /** Diff summary: status → count (4-row frame; the report a scheduler
    * acts on before deciding what to reprocess). */
  def diffCounts(v1: DataFrame, v2: DataFrame, idCol: String,
                 contentCols: Seq[String]): DataFrame =
    diff(v1, v2, idCol, contentCols)
      .groupBy("status").agg(count(lit(1)).cast("long").as("n"))
}
