package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 56-bit string hash computable bit-identically in Spark SQL, DuckDB
  * SQL, and plain Scala: fold the first 14 hex digits of md5 into a long
  * (`acc*16 + digit`). md5 is identical everywhere; 14 hex digits = 56
  * bits fits comfortably in a signed 64-bit integer. This is what makes
  * sketch operators (SimHash) oracle-checkable bit-for-bit instead of
  * "trust me" — a differential-testing property the reference lacks
  * (SURVEY §5).
  *
  * Spark-side the fold is `aggregate` over `split(hex, '')` — fully
  * codegen'd builtins, no UDF in the hot path.
  */
object CrossHash {
  val Bits = 56
  val HexDigits = 14

  /** Spark Column: 56-bit hash of a string column (`conv` parses the hex
    * directly — codegen'd builtin; 56 bits cannot overflow BIGINT). */
  def hash56(s: Column): Column =
    conv(substring(md5(s), 1, HexDigits), 16, 10).cast("long")

  /** The same hash in DuckDB SQL (for oracle queries), over expression `e`. */
  def duckdbHash56(e: String): String =
    s"""list_reduce(list_transform(range($HexDigits),
       | i -> CAST(strpos('0123456789abcdef', substr(md5($e), i+1, 1)) - 1 AS BIGINT)),
       | (a, b) -> a * 16 + b)""".stripMargin.replaceAll("\n", "")

  /** The same hash in plain Scala (for specs / driver-side constants). */
  def scalaHash56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(HexDigits)
    hex.foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))
  }
}
