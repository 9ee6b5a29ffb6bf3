package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Iso8601, IsoDuration}

/** Static, codegen-callable entry points (JIT-friendly monomorphic calls;
  * generated code invokes these directly — no ScalaUDF row conversion, no
  * encoder, no closure capture). */
object IsoEval {
  def iso8601(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(Iso8601.toIso8601(s.toString))

  def duration(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(IsoDuration.normalize(s.toString))
}

/**
 * Native Catalyst expression for N4/N5 ISO-8601 normalization. Compared to
 * the `udf(...)` wrapper this stays inside whole-stage codegen: the
 * generated code calls [[IsoEval.iso8601]] on the UnsafeRow's UTF8String
 * directly, skipping the UDF's catalyst↔scala converters. Registered as
 * SQL function `graft_iso8601` via [[graft.GraftExtensions]].
 */
case class IsoNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_iso8601 requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_iso8601"

  override protected def nullSafeEval(input: Any): Any =
    IsoEval.iso8601(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.IsoEval.iso8601($c)")

  override protected def withNewChildInternal(newChild: Expression): IsoNormalize =
    copy(child = newChild)
}

/** Native expression for N6 duration normalization (`graft_duration`). */
case class DurationNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_duration requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_duration"

  override protected def nullSafeEval(input: Any): Any =
    IsoEval.duration(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.IsoEval.duration($c)")

  override protected def withNewChildInternal(newChild: Expression): DurationNormalize =
    copy(child = newChild)
}

object IsoExpressions {
  private def unary(name: String)(build: Expression => Expression)
      : Seq[Expression] => Expression = { children =>
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${children.length}")
    build(children.head)
  }

  /** (name, info, builder) triples for FunctionRegistry injection. */
  def registryEntries: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_iso8601",
      new ExpressionInfo(classOf[IsoNormalize].getName, "graft_iso8601"),
      unary("graft_iso8601")(IsoNormalize(_))),
    ("graft_duration",
      new ExpressionInfo(classOf[DurationNormalize].getName, "graft_duration"),
      unary("graft_duration")(DurationNormalize(_))))
}
