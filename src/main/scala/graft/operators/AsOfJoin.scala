package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single latest right row
  * of the same key with `rightTime <= leftTime` — the canonical
  * event-stream enrichment against a change stream's history ("state as
  * of the event"), which neither Spark SQL nor the reference exposes as a
  * relational operator.
  *
  * Built by composition (the preference order's option (a) — no custom
  * plan node needed): tag both sides, union, and take a running
  * `last(right-row-struct)` over a window ordered by (time, side,
  * tiebreak) per key. Right rows sort before left rows at equal time, so
  * the join is inclusive (`>=`), matching DuckDB's native `ASOF JOIN`
  * (the oracle). Left-outer semantics: left rows with no prior right row
  * get NULLs.
  *
  * Scale shape: ONE shuffle (the window's hash partition on the key) over
  * |left| + |right| rows — no range-join explosion, no per-key driver
  * state; the same plan a sort-merge as-of physical operator would
  * produce. The right row travels as a struct, so a NULL in a right value
  * column is preserved (row semantics, not `last(value)` per column).
  *
  * @param tiebreak breaks ordering ties among right rows with identical
  *                 (key, time) deterministically (latest wins)
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           keys: Seq[String], leftTime: String, rightTime: String,
           rightValues: Seq[String], tiebreak: Option[String] = None): DataFrame = {
    require(rightValues.nonEmpty, "asOf requires at least one right value column")
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightValues.map(col): _*).schema.fields)))

    val taggedRight = right
      .select((keys.map(col) :+ col(rightTime).as("__t") :+
        struct(rightValues.map(col): _*).as("__rv") :+
        tiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__tb")): _*)
      .withColumn("__side", lit(0))

    val unioned = taggedLeft.select(
      (keys.map(col) ++ Seq(col("__t"), col("__side"), col("__tb"), col("__rv")) ++
        leftCols.filterNot(keys.contains).map(col)): _*)
      .unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = unioned
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++
      rightValues.map(v => col(s"__asof.$v").as(v))
    joined.select(out: _*)
  }

  /** Column-renaming convenience: right value columns exported with a
    * prefix to avoid clashes with left columns of the same name. */
  def asOfPrefixed(left: DataFrame, right: DataFrame,
                   keys: Seq[String], leftTime: String, rightTime: String,
                   rightValues: Seq[String], prefix: String,
                   tiebreak: Option[String] = None): DataFrame = {
    val renamed = rightValues.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, prefix + c))
    asOf(left, renamed, keys, leftTime, rightTime,
      rightValues.map(prefix + _), tiebreak)
  }
}
