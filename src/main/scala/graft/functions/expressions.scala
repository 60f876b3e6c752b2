package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot parse functions. A Column
  * composition of the 5-branch dispatch costs ~30 regex evaluations per
  * row (each branch guard + 9 per-group regexp_extracts); these compile to
  * ONE static call doing at most one compiled-pattern match per branch,
  * and participate in whole-stage codegen (no UDF/serialization overhead).
  */
case class ParseTimestampExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_timestamp"

  override def nullSafeEval(input: Any): Any =
    TimestampParser.parse(input.asInstanceOf[UTF8String].toString) match {
      case null => null
      case v    => v.longValue()
    }

  // UnaryExpression.nullSafeEval short-circuits null inputs, but a matched
  // branch can still produce null — eval must go through our own null check.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val parsed = ctx.freshName("parsed")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        java.lang.Long $parsed =
          graft.functions.TimestampParser.parse(${childGen.value}.toString());
        if ($parsed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $parsed.longValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseTimestampExpr =
    copy(child = newChild)
}

/** parse_date (F6) as a native expression: one compiled-pattern match. */
case class ParseDateExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_date"

  override def nullSafeEval(input: Any): Any =
    TimestampParser.parseDateDays(input.asInstanceOf[UTF8String].toString) match {
      case null => null
      case v    => v.intValue()
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val parsed = ctx.freshName("days")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!${childGen.isNull}) {
        java.lang.Integer $parsed =
          graft.functions.TimestampParser.parseDateDays(${childGen.value}.toString());
        if ($parsed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $parsed.intValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseDateExpr =
    copy(child = newChild)
}
