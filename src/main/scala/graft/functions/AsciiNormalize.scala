package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The canonical-normalize chain
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " "))`
  * as ONE codegen'd byte pass (round 6).
  *
  * The composed builtin form is semantically right but costs three
  * regex/engine traversals plus the copies between them — measured
  * ~60 µs per 400-byte doc, which made the normalize stage the single
  * largest line of the `pipeline_curation_v4` capstone and a
  * per-corpus-byte tax on every normalize-first pipeline. Worse,
  * Catalyst duplicates the whole chain wherever the expression is
  * referenced (the `length(norm) > 0` gate filter pushes a second full
  * evaluation beneath the exchange). A single streaming byte scan does
  * lowercase + strip + collapse + trim in O(n) with one output buffer.
  *
  * Byte-exact parity with the builtin chain (what the DuckDB oracles
  * replay): for pure-ASCII input the fast path mirrors it operation for
  * operation — ASCII lowercase, drop everything outside `[a-z0-9 ]`
  * (dropped chars do NOT break a space run, because the reference
  * strips before collapsing), collapse runs of spaces, trim edge
  * spaces. Any non-ASCII byte routes the WHOLE value through the exact
  * builtin semantics (`String.toLowerCase` + the same two regexes), so
  * Unicode edge cases (uppercase chars whose lowercase IS ASCII, e.g.
  * the Kelvin sign) can never diverge from the reference chain.
  */
case class AsciiNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ascii_normalize requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "ascii_normalize"

  override def nullSafeEval(input: Any): Any =
    AsciiNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiNormalize {

  /** Static kernel shared by eval and codegen. */
  def normalize(in: UTF8String): UTF8String = {
    val b = in.getBytes
    var i = 0
    while (i < b.length) {
      if (b(i) < 0) return slow(in) // non-ASCII byte → exact builtin path
      i += 1
    }
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSpace = false
    i = 0
    while (i < b.length) {
      var c = b(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = c
        n += 1
      } else if (c == ' ') {
        pendingSpace = true
      } // every other char is stripped and does NOT start a space run
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  private def slow(in: UTF8String): UTF8String = {
    // the builtin chain verbatim: lower → strip → collapse; the final
    // trim only ever sees [a-z0-9 ] so a space-only strip is exact
    val s = in.toString.toLowerCase
      .replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ")
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    UTF8String.fromString(s.substring(from, to))
  }
}
