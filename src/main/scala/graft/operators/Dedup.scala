package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (SURVEY §7.5).
  *
  * Scale stance: every variant is a pure DataFrame plan — hash-partitioned
  * by the dedup key (exact) or by LSH band/bucket (minhash), so the shuffle
  * volume is O(corpus) with no driver materialization; at 100 TB the
  * band-bucket join is the standard MinHash-LSH sharding and skewed buckets
  * are bounded by banding parameters.
  */
object Dedup {

  /** Exact dedup: one surviving row id per duplicate group (min id wins),
    * plus the group size. Single hash-aggregate shuffle on the key columns.
    */
  def exact(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "n_copies")
}
