package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-diversity counters for the low-entropy quality
  * signals (operators/TextOps.qCharDiversity and the curation funnel's
  * stage-2 gate): returns
  *
  *   [n_chars_total, n_distinct_chars, top_char_count]
  *
  * over the text's characters — exactly the counts the composed
  * formulation derives with a per-character explode and TWO corpus-wide
  * groupBy shuffles (chars × docs rows through the exchange, ~250
  * shuffled rows per document); this walks the document once inside
  * whole-stage codegen, so the signal is map-only at any corpus size.
  * The permille arithmetic stays in Column land, untouched, so the
  * DuckDB oracle expression is unchanged.
  *
  * Parity contract with the composed shape (asserted in
  * NativeVsComposedSpec): characters are code points — equal to the
  * composed `split(text, "")` / DuckDB `substring(text, i, 1)` on any
  * BMP corpus, and surrogate-safe beyond it; empty text returns
  * [0, 0, 0] (the composed shape filters empty texts out and fills
  * nulls downstream).
  */
object CharDiversity {

  private val Sum: java.util.function.BiFunction[Integer, Integer, Integer] =
    (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue)

  def stats(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Integer](64)
    var total = 0L
    var top = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      val c = counts.merge(cp, 1, Sum)
      if (c > top) top = c
    }
    new GenericArrayData(Array(total, counts.size.toLong, top.toLong))
  }

  def stats(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CharDiversityExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}

case class CharDiversityExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_diversity"

  override def nullSafeEval(input: Any): Any =
    CharDiversity.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharDiversity.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): CharDiversityExpr =
    copy(child = newChild)
}
