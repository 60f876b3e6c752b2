package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition counters for the Gopher-style quality filters
  * (operators/TextOps.qRepetition): returns
  *
  *   [n_tokens, max_tok_count, dup2_distinct, dup2_total, dup3_distinct, dup3_total]
  *
  * over the ' '-split tokens of the trimmed text — exactly the counts the
  * composed formulation derives with four interpreted higher-order
  * lambdas (mode count, two gram builders, two array_distincts), which
  * cost ~100 µs/doc; this walks the document once inside whole-stage
  * codegen. The double arithmetic (fractions, thresholds) stays in Column
  * land so the DuckDB oracle expression is untouched.
  *
  * Parity contract with the composed shape (asserted in
  * NativeVsComposedSpec):
  *  - tokens = split(trim(text), ' ') INCLUDING interior empties
  *    (double spaces); empty trimmed text is ONE empty token;
  *  - gram totals are n-g+1, reported as 0 when n < g+1 (the composed
  *    `when(size >= g+1)` guard, which also zeroes the single-gram case
  *    n == g);
  *  - distinct grams compare by full string content (join-with-' '
  *    equality == adjacency-span equality).
  */
object RepetitionStats {

  def stats(s: UTF8String): GenericArrayData = {
    val toks = s.trim.toString.split(" ", -1)
    val n = toks.length
    val counts = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    var maxTok = 0
    while (i < n) {
      val c = counts.merge(toks(i), 1, Integer.sum)
      if (c > maxTok) maxTok = c
      i += 1
    }
    def gramStats(g: Int): (Long, Long) = {
      if (n < g + 1) (0L, 0L)
      else {
        val total = n - g + 1
        val seen = new java.util.HashSet[String](total * 2)
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j <= n - g) {
          sb.setLength(0)
          var k = 0
          while (k < g) {
            if (k > 0) sb.append(' ')
            sb.append(toks(j + k))
            k += 1
          }
          seen.add(sb.toString)
          j += 1
        }
        (seen.size.toLong, total.toLong)
      }
    }
    val (d2, t2) = gramStats(2)
    val (d3, t3) = gramStats(3)
    new GenericArrayData(Array(n.toLong, maxTok.toLong, d2, t2, d3, t3))
  }

  def stats(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      RepetitionStatsExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}
