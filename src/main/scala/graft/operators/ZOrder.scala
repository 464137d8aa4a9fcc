package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data skipping —
  * the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: quantize
  * each clustering column to `bitsPerCol` bits, interleave the bits, and
  * lay data out sorted by the interleaved value. Files then hold small
  * hyper-rectangles of the key space, so parquet min/max stats prune
  * scans for predicates on ANY clustered column, not just the leading
  * sort key (row-major sort skips only on its prefix).
  *
  * Quantization is linear between the column's observed min/max
  * (collected in one tiny aggregate — 2 longs per column, the standard
  * metadata-sized driver round trip). Linear scaling is skew-sensitive
  * but stat-free; heavy skew should pre-transform (log/bucket) the
  * column. The interleave itself is plain Column shift/mask arithmetic
  * — fully codegen'd, no UDF.
  */
object ZOrder {

  /** Morton-interleaved value of `cols` (long-castable), each quantized
    * to `bitsPerCol` bits over [min, max] from `ranges`. */
  def zvalue(cols: Seq[Column], ranges: Seq[(Long, Long)],
             bitsPerCol: Int = 16): Column = {
    require(cols.nonEmpty && cols.size == ranges.size, "one range per column")
    require(bitsPerCol * cols.size <= 62, "interleaved width must fit a long")
    val k = cols.size
    val quantized = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = math.max(1L, hi - lo)
      // quantize in DOUBLE: (v-lo)*maxQ in long overflows once the span
      // exceeds ~2^47 (e.g. epoch-nanosecond columns), silently wrecking
      // the hyper-rectangle property; double math stays monotone (ties
      // from the 53-bit mantissa only merge adjacent buckets)
      least(greatest(
        ((c.cast("long") - lit(lo)).cast("double")
          * lit(((1L << bitsPerCol) - 1).toDouble) / lit(span.toDouble))
          .cast("long"),
        lit(0L)), lit((1L << bitsPerCol) - 1L))
    }
    // bit i of column c lands at position i*k + c
    val terms = for {
      (q, c) <- quantized.zipWithIndex
      i <- 0 until bitsPerCol
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce(_ + _).as("__zvalue")
  }

  /** Observed (min, max) per column — one aggregate, 2k longs. An empty
    * (or all-null) frame has no observed range: fall back to (0, 0)
    * instead of NPE-ing on the null aggregate (zvalue then quantizes
    * everything to bucket 0, which is vacuously correct on no rows). */
  def columnRanges(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__lo_$c"),
      max(col(c).cast("long")).as(s"__hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(2 * i)) (0L, 0L)
      else (row.getLong(2 * i), row.getLong(2 * i + 1))
    }
  }

  /** Repartition+sort `df` in Z-order over `cols` into `numFiles`
    * range-partitioned output partitions. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bitsPerCol: Int = 16): DataFrame = {
    val z = zvalue(cols.map(col), columnRanges(df, cols), bitsPerCol)
    df.withColumn("__zvalue", z)
      .repartitionByRange(numFiles, col("__zvalue"))
      .sortWithinPartitions("__zvalue")
      .drop("__zvalue")
  }
}
