package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points with a timestamp column
  * against intervals `[start, end)` — sessionization, windows-of-interest
  * joins, event-to-campaign attribution.
  *
  * The naive formulation `p.ts >= i.start AND p.ts < i.end` has no
  * equi-key, so Spark plans a BroadcastNestedLoopJoin (or cartesian) —
  * O(points × intervals) compared at 100 TB. This operator uses the
  * standard bucketization rewrite: both sides map to fixed-width time
  * buckets — a point to ONE bucket, an interval to every bucket its span
  * overlaps (an explode of `span/width` rows, small when the width is
  * chosen near the typical interval length) — then an EQUI-join on the
  * bucket id finds every candidate co-bucketed pair and the exact range
  * predicate filters. Shuffle volume is O(points + intervals·span/width),
  * never the cross product; skewed buckets ride the same AQE machinery
  * as every other equi-join (PERF.md skew findings apply).
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose `[startCol, endCol)` contain
    * `ptCol` (end exclusive). Columns must be timestamp-castable; bucket
    * width is in seconds. Both frames' columns survive (caller
    * disambiguates names). */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(ptCol).cast("long") / bucketSeconds))
    // end is exclusive, so the last overlapped bucket is the one holding
    // end - 1s; sequence() is inclusive on both ends
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketSeconds),
        floor((col(endCol).cast("long") - 1) / bucketSeconds))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
