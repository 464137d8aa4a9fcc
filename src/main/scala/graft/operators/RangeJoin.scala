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
    * disambiguates names).
    *
    * Bucket math runs on integer MICROSECONDS with a pmod-based floor
    * division — all-Long arithmetic, so sub-second timestamps bucket
    * exactly (a whole-second formulation loses points that land in the
    * bucket holding a fractional interval end, and double division can
    * mis-bucket values within half-an-ulp of a boundary). Degenerate
    * intervals (`end <= start`) contain nothing by the [start, end)
    * contract and are dropped BEFORE the explode — otherwise an inverted
    * pair feeds `sequence()` a descending range and bloats the shuffle
    * with candidates the exact filter only discards later. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = bucketSeconds * 1000000L // bucket width in microseconds
    def floorDiv(c: String): String = s"($c - pmod($c, ${b}L)) div ${b}L"
    val pb = points
      .withColumn("__pt_us", unix_micros(col(ptCol).cast("timestamp")))
      .withColumn("__bucket", expr(floorDiv("__pt_us")))
      .drop("__pt_us")
    // end is exclusive: the last overlapped bucket holds end − 1 µs
    val ib = intervals
      .withColumn("__s_us", unix_micros(col(startCol).cast("timestamp")))
      .withColumn("__e_us", unix_micros(col(endCol).cast("timestamp")))
      .filter(col("__e_us") > col("__s_us"))
      .withColumn("__bucket", explode(sequence(
        expr(floorDiv("__s_us")), expr(floorDiv("(__e_us - 1)")))))
      .drop("__s_us", "__e_us")
    pb.join(ib, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
