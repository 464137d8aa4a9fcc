package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All cosine similarities of one vector against a flattened centroid
  * matrix, in a single codegen'd loop:
  * `centroid_cosines(vec, flat, dims)[k] = cos(vec, flat[k*dims ..< (k+1)*dims])`.
  *
  * Why an expression and not K inline [[VectorCosine]] trees: a coarse
  * quantizer's K grows with the corpus (SemDedup at 10× uses 10× the
  * centroids), and K separate 64-float-literal cosine subtrees blow past
  * the JVM's 64 KB method limit around K≈100 — whole-stage codegen then
  * falls back to interpreted evaluation and the assignment pass goes
  * superlinear (measured 37 s for K=160 × 20 k vectors vs ~0.5 s at
  * K=16). One loop over a single flat literal keeps the method tiny at
  * any K. Raw (unrounded) doubles are returned; callers apply Spark's
  * own `round(_, 6)` so oracle parity is by construction.
  *
  * Same sequential fold as [[VectorCosine]] → bit-identical results.
  */
case class CentroidCosines(first: Expression, second: Expression,
                           third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "centroid_cosines requires (array<float>, array<float>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "centroid_cosines"

  override def nullSafeEval(v: Any, flat: Any, d: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = flat.asInstanceOf[ArrayData]
    val dims = d.asInstanceOf[Int]
    val k = m.numElements() / dims
    val out = new Array[Double](k)
    var na = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val xv = x.getFloat(i).toDouble; na += xv * xv; i += 1 }
    val sna = math.sqrt(na)
    var c = 0
    while (c < k) {
      var dot = 0.0; var nb = 0.0
      var j = 0
      val lim = math.min(n, dims)
      while (j < lim) {
        val xv = x.getFloat(j).toDouble
        val yv = m.getFloat(c * dims + j).toDouble
        dot += xv * yv; nb += yv * yv
        j += 1
      }
      out(c) = dot / (sna * math.sqrt(nb))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, flat, d) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $k = $flat.numElements() / $d;
         |int $n = $v.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $v.getFloat($i);
         |  $na += $xv * $xv;
         |}
         |double $sna = Math.sqrt($na);
         |double[] $out = new double[$k];
         |int $lim = Math.min($n, $d);
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dot = 0.0, $nb = 0.0;
         |  for (int $j = 0; $j < $lim; $j++) {
         |    double $xv = (double) $v.getFloat($j);
         |    double $yv = (double) $flat.getFloat($c * $d + $j);
         |    $dot += $xv * $yv; $nb += $yv * $yv;
         |  }
         |  $out[$c] = $dot / ($sna * Math.sqrt($nb));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Argmax centroid INDEX (0-based) for one vector against a flattened
  * centroid matrix — cosine rounding and tie-break fused INTO the loop:
  * `round(cos, 6)` replicated exactly as Spark's `Round` (BigDecimal
  * HALF_UP with the NaN/∞ passthrough), ties broken toward the HIGHEST
  * index (callers sort centroids by cell id, so highest index == highest
  * cid — identical to `array_max` over (cos, cid) structs).
  *
  * Why fused: returning the score array and arg-maxing with per-element
  * expressions re-runs the kernel once per reference after Catalyst
  * collapses the projections (measured: the score-array formulation was
  * 5× SLOWER than K inline trees at K=16, and interpreted at K=160).
  * One expression, one evaluation, one loop. NaN cosines (zero vectors)
  * lose every comparison here, whereas Spark's struct ordering ranks NaN
  * highest — divergence only for all-NaN rows, which callers guard by
  * corpus contract (embeddings are finite, non-zero).
  */
case class NearestCentroid(first: Expression, second: Expression,
                           third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid requires (array<float>, array<float>, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  private def round6(cos: Double): Double =
    if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
    else java.math.BigDecimal.valueOf(cos)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(v: Any, flat: Any, d: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = flat.asInstanceOf[ArrayData]
    val dims = d.asInstanceOf[Int]
    val k = m.numElements() / dims
    val n = x.numElements()
    var na = 0.0
    var i = 0
    while (i < n) { val xv = x.getFloat(i).toDouble; na += xv * xv; i += 1 }
    val sna = math.sqrt(na)
    val lim = math.min(n, dims)
    var best = -1
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0; var nb = 0.0
      var j = 0
      while (j < lim) {
        val xv = x.getFloat(j).toDouble
        val yv = m.getFloat(c * dims + j).toDouble
        dot += xv * yv; nb += yv * yv
        j += 1
      }
      val r = round6(dot / (sna * math.sqrt(nb)))
      if (r >= bestCos) { bestCos = r; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, flat, d) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val cos = ctx.freshName("cos")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      s"""
         |int $k = $flat.numElements() / $d;
         |int $n = $v.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $v.getFloat($i);
         |  $na += $xv * $xv;
         |}
         |double $sna = Math.sqrt($na);
         |int $lim = Math.min($n, $d);
         |int $best = -1;
         |double $bestCos = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dot = 0.0, $nb = 0.0;
         |  for (int $j = 0; $j < $lim; $j++) {
         |    double $xv = (double) $v.getFloat($j);
         |    double $yv = (double) $flat.getFloat($c * $d + $j);
         |    $dot += $xv * $yv; $nb += $yv * $yv;
         |  }
         |  double $cos = $dot / ($sna * Math.sqrt($nb));
         |  double $r = (Double.isNaN($cos) || Double.isInfinite($cos)) ? $cos
         |    : java.math.BigDecimal.valueOf($cos)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if ($r >= $bestCos) { $bestCos = $r; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
