package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-8 BYTES (Aho & Corasick CACM'75).
  * Byte-level matching is exact for valid UTF-8: a pattern's first byte
  * is ASCII or a lead byte, never a 10xxxxxx continuation byte, so a
  * byte match can only start (and, symmetrically, end) on a character
  * boundary. Built once per plan instance from the literal pattern
  * list; the per-row walk is O(bytes + matches) regardless of how many
  * patterns the blocklist carries. */
final class AcAutomaton(patterns: Array[String]) extends Serializable {
  private val pats: Array[Array[Byte]] = patterns.map(_.getBytes("UTF-8"))

  // dense goto table (256 per state), fail links, and per-state merged
  // output pattern ids — blocklists are ≤ ~10k states, so the dense
  // table (1 MB per 1k states) buys branchless per-byte transitions.
  // Rows grow one state at a time as the trie inserts them: sizing the
  // table at Σ pattern bytes up front ignores prefix sharing and
  // transiently costs ~1 KiB per pattern byte (~200 MB for a 10k-pattern
  // blocklist) on the driver AND again per executor at deserialize.
  private val (gotoTab, outTab) = {
    val g = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for ((p, pid) <- pats.zipWithIndex) {
      var s = 0
      for (b <- p) {
        val c = b & 0xff
        if (g(s)(c) == -1) {
          g += Array.fill(256)(-1); out += Nil
          g(s)(c) = g.size - 1
        }
        s = g(s)(c)
      }
      out(s) ::= pid
    }
    val nStates = g.size
    val fail = new Array[Int](nStates)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      if (g(0)(c) == -1) g(0)(c) = 0
      else if (g(0)(c) != 0) { fail(g(0)(c)) = 0; queue += g(0)(c) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      // BFS order: fail(s) is shallower, so its goto row and output set
      // are already final when s reads them
      var c = 0
      while (c < 256) {
        val t = g(s)(c)
        if (t != -1) {
          queue += t
          fail(t) = g(fail(s))(c)
          out(t) = out(t) ++ out(fail(t))
        } else g(s)(c) = g(fail(s))(c)
        c += 1
      }
    }
    (g.toArray, out.toArray.map(_.distinct.sorted.toArray))
  }

  /** Occurrence count per pattern id (ALL occurrences, overlapping
    * included — the automaton reports every match end position), as a
    * dense P-length array. */
  def matchCounts(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](pats.length)
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = gotoTab(st)(bytes(i) & 0xff)
      val o = outTab(st)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Sorted distinct ids of every pattern occurring in `s`. */
  def matchedIds(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val hit = new Array[Boolean](pats.length)
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = gotoTab(st)(bytes(i) & 0xff)
      val o = outTab(st)
      var j = 0
      while (j < o.length) { hit(o(j)) = true; j += 1 }
      i += 1
    }
    val n = hit.count(identity)
    val ids = new Array[Int](n)
    var k = 0; var p = 0
    while (p < hit.length) { if (hit(p)) { ids(k) = p; k += 1 }; p += 1 }
    new GenericArrayData(ids)
  }
}

/** `multi_match(text)` against a literal pattern list: the sorted
  * distinct ids of every blocklist pattern occurring in the text, from
  * ONE automaton pass — vs P separate `contains()` scans, the
  * difference between O(bytes) and O(P·bytes) on the PII/NSFW-blocklist
  * hot path. Codegen stays inside whole-stage codegen via a reference
  * object (one virtual call per row; the automaton itself is plan-time
  * state, like the PQ codebooks). */
case class MultiMatch(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match needs at least one non-empty pattern")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match requires a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "multi_match"

  @transient private lazy val auto = new AcAutomaton(patterns.toArray)

  override def nullSafeEval(v: Any): Any =
    auto.matchedIds(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", auto,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matchedIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `multi_match_counts(text)`: occurrence count per blocklist pattern
  * (dense P-length array<long>, ALL occurrences incl. overlapping) from
  * the same single automaton pass as [[MultiMatch]] — the severity
  * variant a PII scorer consumes (how MANY hits, not just whether). */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match_counts needs at least one non-empty pattern")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match_counts requires a string column, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "multi_match_counts"

  @transient private lazy val auto = new AcAutomaton(patterns.toArray)

  override def nullSafeEval(v: Any): Any =
    auto.matchCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", auto,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matchCounts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
