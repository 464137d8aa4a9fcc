package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `grok(value, pattern)` as a native Catalyst expression (the graduation
  * from UDF planned in SURVEY §7.4): no ScalaUDF encoder round-trips —
  * the match produces catalyst [[MapData]] directly, and codegen calls the
  * expression object straight from the generated stage (no closure
  * serialization). Pattern compilation is cached in [[Grok]] per pattern
  * string, so per-row cost is one regex `find` + capture copy.
  *
  * Returns NULL when the line does not match — the reference builtin's
  * contract (example_project .../http_events.sql:41-46 usage).
  */
case class GrokExtract(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"grok requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = MapType(StringType, StringType)

  override def nullable: Boolean = true

  override def prettyName: String = "grok"

  /** Shared by interpreted eval and generated code. */
  def doEval(value: UTF8String, pattern: UTF8String): MapData =
    Grok.eval(value.toString, pattern.toString) match {
      case Some(m) =>
        val kv = m.toArray
        new ArrayBasedMapData(
          new GenericArrayData(kv.map(e => UTF8String.fromString(e._1): Any)),
          new GenericArrayData(kv.map(e => UTF8String.fromString(e._2): Any)))
      case None => null
    }

  override def nullSafeEval(v: Any, p: Any): Any =
    doEval(v.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val ref = ctx.addReferenceObj("grokExpr", this, classOf[GrokExtract].getName)
      s"""
         |${ev.value} = $ref.doEval($v, $p);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
