package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass W-token-window gram hashes — the codegen'd twin of
  * the composed form
  * {{{
  *   h = transform(split(trim(text), " "), t ->
  *         aggregate(split(t, ""), 0L, (a, c) -> (a*tokenBase + ascii(c)) % P))
  *   ghs = [fold(h[j .. j+W-1], (a, x) -> (a*gramBase + x) % P) for j]
  * }}}
  * which the SpanDedup / Winnow oracles replay in DuckDB. The composed
  * HOF chain allocates per-token char arrays and per-window slices in
  * interpreted eval — the dominant cost of the span/winnow lanes; this
  * walks the code points once, folds tokens and windows in primitive
  * longs, and returns the m = n_toks − W + 1 window hashes (null when
  * n_toks < W, matching the composed form's length filter).
  *
  * Token semantics mirror `split(trim(text), " ")` exactly: trim strips
  * 0x20 only, every single space delimits, consecutive spaces yield empty
  * tokens folding to 0 — bit-parity is spec-pinned against the composed
  * expressions (`NativeVsComposedSpec`).
  */
object PolyGramHashes {
  private val P = PolyMinHash.P

  def gramHashes(s: UTF8String, w: Int, tokenBase: Int, gramBase: Int): GenericArrayData = {
    val str = s.trim.toString
    val n = str.length
    if (n == 0) return null
    var numTokens = 1
    var i = 0
    while (i < n) { if (str.charAt(i) == ' ') numTokens += 1; i += 1 }
    if (numTokens < w) return null
    val starts = new Array[Int](numTokens + 1)
    var tok = 1
    i = 0
    while (i < n) {
      if (str.charAt(i) == ' ') { starts(tok) = i + 1; tok += 1 }
      i += 1
    }
    starts(numTokens) = n + 1
    val th = new Array[Long](numTokens)
    var k = 0
    while (k < numTokens) {
      val until = starts(k + 1) - 1
      var acc = 0L
      var j = starts(k)
      while (j < until) {
        val cp = str.codePointAt(j)
        acc = (acc * tokenBase + cp) % P
        j += Character.charCount(cp)
      }
      th(k) = acc
      k += 1
    }
    val m = numTokens - w + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      var acc = 0L
      var j = g
      val until = g + w
      while (j < until) {
        acc = (acc * gramBase + th(j)) % P
        j += 1
      }
      out(g) = acc
      g += 1
    }
    new GenericArrayData(out)
  }

  def gramHashes(c: Column, w: Int, tokenBase: Int, gramBase: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PolyGramHashesExpr(org.apache.spark.sql.GraftSqlBridge.expression(c),
        w, tokenBase, gramBase))
}

/** Array of W-token-window poly gram hashes — see [[PolyGramHashes]]. */
case class PolyGramHashesExpr(child: Expression, w: Int, tokenBase: Int, gramBase: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null for < w-token docs even on non-null input
  override def nullable: Boolean = true
  override def prettyName: String = "poly_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    PolyGramHashes.gramHashes(input.asInstanceOf[UTF8String], w, tokenBase, gramBase)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PolyGramHashes.gramHashes($c, $w, $tokenBase, $gramBase);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PolyGramHashesExpr =
    copy(child = newChild)
}
