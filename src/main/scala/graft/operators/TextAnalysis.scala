package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.5):
  * quality metrics, token counting, language ID, fingerprinting. All are
  * narrow per-row projections — no shuffle, fully codegen'd builtins.
  */
object TextAnalysis {

  /** Per-document quality metrics: char count, token count, average token
    * length. Matches the DuckDB oracle expression-for-expression.
    */
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT)")
        .as("n_tokens"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") /
        expr("CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS DOUBLE)"))
        .cast("double").as("avg_token_len"))
}
