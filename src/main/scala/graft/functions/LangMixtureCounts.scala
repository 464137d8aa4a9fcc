package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole `langMixture` segment-classification loop as ONE kernel
  * call per document (round 6): `[n_segments, c_lang1, …, c_lang5]`.
  *
  * The composed form — 20 `regexp_extract_all` marker counts inside
  * nested `transform` lambdas — is semantically right but runs on the
  * higher-order-function INTERPRETED path (lambda bodies never enter
  * whole-stage codegen), re-traversing every segment once per marker
  * word: the most expensive line of the round-5 sweep (`lang_mixture`
  * ~3 s warm at sf0.1, 20× the cost of its doc-level sibling). One
  * fused pass tokenizes each segment once and classifies against the
  * marker table directly.
  *
  * EXACT parity with the regex form (the DuckDB oracle is unchanged):
  * `regexp_extract_all(seg, '(?:^| )w(?: |$)')` counts space-delimited
  * occurrences of `w`, but non-overlapping matching CONSUMES the
  * trailing space, so a maximal run of k consecutive `w` tokens counts
  * ⌈k/2⌉, and a doubled space (an EMPTY token) breaks the run because
  * it leaves the second boundary unconsumed. The tokenizer replicates
  * both rules: a marker token is skipped iff it equals the previous
  * token AND that one was counted (then the skip re-arms the counter);
  * empty/non-marker tokens reset the run. LangMixtureSpec pins the
  * kernel against the regex formulation on fuzzed inputs, adjacency
  * edges included.
  *
  * Segmentation mirrors `transform(split(text, "[.!?]"), s ⇒
  * trim(lower(s)))` + non-empty filter: lowercase is UTF8String's own
  * (Spark's `lower`), split chars are the literal three, trim strips
  * spaces only.
  */
case class LangMixtureCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_mixture_counts requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "lang_mixture_counts"

  override def nullSafeEval(input: Any): Any =
    LangMixtureCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangMixtureCounts.counts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangMixtureCounts {

  /** Marker words per language — the kernel-side source of truth;
    * [[graft.operators.TextAnalysis.LangMarkers]] aliases this so the
    * regex formulation, the oracle builder, and the kernel can never
    * drift apart. Words are unique ACROSS languages (asserted below),
    * which is what lets one token lookup serve all five regex passes. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"),
    "zh" -> Seq("的", "和", "是", "了"))

  val NumLangs: Int = Markers.length

  private val wordLang: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Markers.zipWithIndex.foreach { case ((_, ws), i) =>
      ws.foreach { w =>
        require(m.put(w, i) == null, s"marker '$w' in two languages")
      }
    }
    m
  }

  /** `[n_segments, count(lang_0), …, count(lang_4)]` for one document. */
  def counts(in: UTF8String): ArrayData = {
    // Spark's lower(): UTF8String's own case mapping, applied before
    // segmentation (lowercase never produces/destroys . ! ? for any
    // input the mapping touches)
    val s = in.toLowerCase.toString
    val out = new Array[Int](1 + NumLangs)
    val segCounts = new Array[Int](NumLangs)
    var segStart = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || { val c = s.charAt(i); c == '.' || c == '!' || c == '?' }) {
        classifySegment(s, segStart, i, segCounts)
        // argmax with first-language tie-break; all-zero ⇒ 'und'
        // (counted in n_segments but no language bucket)
        var best = 0
        var bestIdx = -1
        var j = 0
        while (j < NumLangs) {
          if (segCounts(j) > best) { best = segCounts(j); bestIdx = j }
          j += 1
        }
        var anyToken = false
        // a segment exists iff it is non-empty after trim — flagged by
        // classifySegment leaving segStart < trimmed end; recompute here
        var a = segStart
        var b = i
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        anyToken = a < b
        if (anyToken) {
          out(0) += 1
          if (bestIdx >= 0) out(1 + bestIdx) += 1
        }
        segStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Marker counts for s[from, until) (one segment), replicating the
    * per-word regex pass: runs of identical adjacent marker tokens
    * count ⌈k/2⌉; empty tokens (doubled spaces) break runs. */
  private def classifySegment(s: String, from: Int, until: Int,
                              acc: Array[Int]): Unit = {
    java.util.Arrays.fill(acc, 0)
    // trim spaces (the `trim(lower(x))` step)
    var a = from
    var b = until
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    var tokStart = a
    var prevTok: String = null
    var prevCounted = false
    var i = a
    while (i <= b) {
      if (i == b || s.charAt(i) == ' ') {
        if (i > tokStart) {
          val tok = s.substring(tokStart, i)
          val lang = wordLang.get(tok)
          if (lang != null) {
            if (tok == prevTok && prevCounted) {
              prevCounted = false // consumed boundary: this one is unmatched
            } else {
              acc(lang) += 1
              prevCounted = true
            }
          } else prevCounted = false
          prevTok = tok
        } else {
          // empty token (doubled space): breaks the run, boundary re-arms
          prevTok = null
          prevCounted = false
        }
        tokStart = i + 1
      }
      i += 1
    }
  }
}
