package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

import graft.operators.CrossHash

/** All random-hyperplane LSH signatures of a float vector in one fused
  * pass: for signature table `t` (seeded by `seeds(t)`), bit `p` is
  * `sign(Σ_d w(t,p,d) · v[d]) > 0` with deterministic ±1 weights
  * `w(t,p,d) = ±1` from `CrossHash.scalaHash56(s"${seeds(t)}$p:$d")` —
  * the exact weight/summation convention of the original `zip_with` +
  * `aggregate` formulation, so for well-formed vectors (length == dims,
  * no null elements) signature values — and therefore LSH buckets and
  * pair recall — are bit-identical to it. Ragged vectors differ BY
  * DESIGN: the fused kernel dots the first min(len, dims) elements
  * (a partial signature), where the old HOF formulation null-poisoned
  * the fold and collapsed every short vector into bucket 0 — a hash
  * hot-spot, not a feature.
  *
  * Why a custom Catalyst Expression: the HOF formulation is interpreted
  * (CodegenFallback) — tables×planes folds per row, each allocating a
  * zipped array, re-evaluated on every side of the LSH self-join and
  * inlined through the bucket-explode Generate nodes. Here the whole
  * weight matrix is a plan-time byte array and the signature is one
  * whole-stage-codegen loop: tables×planes×dims fused adds, a single
  * long[tables] allocation per row.
  */
case class PlaneSignatures(child: Expression, seeds: Seq[String],
                           planes: Int, dims: Int)
  extends UnaryExpression {

  require(planes > 0 && planes <= 63, s"planes must be in [1,63], got $planes")

  private val tables = seeds.length

  /** ±1 weights, laid out [t][p][d] flattened. */
  @transient private lazy val weights: Array[Byte] = {
    val w = new Array[Byte](tables * planes * dims)
    var i = 0
    for (t <- 0 until tables; p <- 0 until planes; d <- 0 until dims) {
      w(i) = if ((CrossHash.scalaHash56(s"${seeds(t)}$p:$d") & 1L) == 0L) 1 else -1
      i += 1
    }
    w
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"plane_sigs requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "plane_sigs"

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val lim = math.min(vec.numElements(), dims)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dims
        var dot = 0.0
        var d = 0
        while (d < lim) {
          val v = vec.getFloat(d).toDouble
          dot += (if (weights(base + d) > 0) v else -v)
          d += 1
        }
        if (dot > 0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val w = ctx.addReferenceObj("planeWeights", weights, "byte[]")
      val lim = ctx.freshName("lim")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val v = ctx.freshName("v")
      s"""
         |int $lim = Math.min($vec.numElements(), $dims);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $base = ($t * $planes + $p) * $dims;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $lim; $d++) {
         |      double $v = (double) $vec.getFloat($d);
         |      $dot += ($w[$base + $d] > 0) ? $v : -$v;
         |    }
         |    if ($dot > 0) $sig |= 1L << $p;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
