package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a set of 64-bit element hashes: for permutation j,
  * `minhash_j = min over h of mix64(h ⊕ (j+1)·φ64)` — the standard
  * one-hash-function + per-permutation mixing construction (φ64 =
  * 0x9E3779B97F4A7C15, the 64-bit golden-ratio increment; mix64 is the
  * SplitMix64 finalizer from Steele et al.'s published algorithm).
  *
  * Why a custom Catalyst Expression: the `transform(sequence(0,127), j ->
  * array_min(transform(hs, h -> xxhash64(j, h))))` formulation runs on the
  * interpreted higher-order-function path — ~numHashes×|set| closure calls
  * and numHashes array materializations per row, which dominated the whole
  * bench at sf0.1. Here the signature is one fused primitive loop in
  * whole-stage codegen: numHashes×|set| multiply-xor-shift ops, a single
  * long[numHashes] allocation per row.
  */
case class MinHashes(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhashes requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhashes"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var m = Long.MaxValue
      val salt = (j + 1) * MinHashes.Phi64
      var i = 0
      while (i < n) {
        val v = MinHashes.mix64(hs.getLong(i) ^ salt)
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val salt = ctx.freshName("salt")
      val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$numHashes];
         |for (int $j = 0; $j < $numHashes; $j++) {
         |  long $m = Long.MAX_VALUE;
         |  long $salt = ($j + 1L) * ${MinHashes.Phi64}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $hs.getLong($i) ^ $salt;
         |    $v = ($v ^ ($v >>> 30)) * ${MinHashes.Mult1}L;
         |    $v = ($v ^ ($v >>> 27)) * ${MinHashes.Mult2}L;
         |    $v = $v ^ ($v >>> 31);
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$j] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashes {
  val Phi64: Long = 0x9E3779B97F4A7C15L
  val Mult1: Long = 0xBF58476D1CE4E5B9L
  val Mult2: Long = 0x94D049BB133111EBL

  /** SplitMix64 finalizer (public domain algorithm, Steele/Lea/Flood). */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * Mult1
    z = (z ^ (z >>> 27)) * Mult2
    z ^ (z >>> 31)
  }
}
