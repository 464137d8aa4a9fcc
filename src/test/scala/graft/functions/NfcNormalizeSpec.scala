package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NfcNormalize]] -- canonical composition, the fast no-op path, null
  * propagation, and codegen vs interpreted agreement. All non-ASCII
  * chars are built from numeric escapes so no editor/tool can silently
  * re-compose a source literal. */
class NfcNormalizeSpec extends SparkSpec {

  private val acute  = "\u0301"  // combining acute accent
  private val ring   = "\u030A"  // combining ring above
  private val eAcute = "\u00E9"  // composed e-acute
  private val aRing  = "\u00C5"  // composed A-ring

  private def norm(values: Seq[String]) = {
    import spark.implicits._
    GraftFunctions.register(spark)
    values.toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
  }

  test("decomposed sequences compose: e+U+0301 -> U+00E9, A+U+030A -> U+00C5") {
    val out = norm(Seq("e" + acute, "A" + ring, "cafe" + acute))
    assert(out.toSeq == Seq(Some(eAcute), Some(aRing), Some("caf" + eAcute)))
    // sanity: the inputs really were decomposed (2 chars per glyph)
    assert(("e" + acute).length == 2 && eAcute.length == 1)
  }

  test("already-NFC text passes through unchanged (quick-check fast path)") {
    val out = norm(Seq("plain ascii text", "caf" + eAcute, ""))
    assert(out.toSeq ==
      Seq(Some("plain ascii text"), Some("caf" + eAcute), Some("")))
  }

  test("null propagates") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq[Option[String]](None, Some("x"))
      .toDF("s").select(call_function("nfc_normalize", col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, Some("x")))
  }

  test("interpreted path (eval on a literal) composes identically") {
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "e" + acute + " A" + ring),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == eAcute + " " + aRing)
  }
}
