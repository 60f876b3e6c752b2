package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PORTABLE MinHash signature over word-3-gram shingles.
  *
  * Same contract as [[MinHash.signature]] but over the portable
  * universal hash family the DuckDB oracle can compute identically:
  *
  *   base(s) = fold over code points of s: (acc*31 + cp) mod P
  *   h_k(s)  = (A_k * base(s) + B_k) mod P
  *
  * Bit-for-bit equal to the composed Column formulation
  * (`transform(shingles, aggregate(split(s,""), ascii ...))` then K
  * `array_min`s of affine transforms): Spark's `ascii` of a 1-char string
  * is `codePointAt(0)` — exactly DuckDB's `ascii` — so the code-point
  * walk here matches both engines. The interpreted composed path costs
  * ~one lambda step per CHARACTER per shingle; this walks the document
  * once inside whole-stage codegen (shingle dedup is free — min over a
  * multiset equals min over its distinct set).
  *
  * All intermediates stay within BIGINT for both engines: the fold step
  * is bounded by 31·P + maxCodePoint < 3.2e10 and the affine step by
  * P² + P < 1.1e18 (DuckDB errors on BIGINT overflow, so the bound is
  * load-bearing).
  */
object PolyMinHash {
  val P = 1000000007L
  val NumPerms = 16

  /** h_k coefficients, k = 1..NumPerms (Knuth multiplicative / quadratic
    * seeds — any fixed family works; these are mirrored literally in the
    * oracle SQL). */
  val A: Array[Long] = Array.tabulate(NumPerms)(k => (2654435761L * (k + 1)) % P)
  val B: Array[Long] = Array.tabulate(NumPerms)(k => (40503L * (k + 1) * (k + 1) + 17) % P)

  /** Portable polynomial hash of one string (code-point fold mod P). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      acc = (acc * 31 + cp) % P
      j += Character.charCount(cp)
    }
    acc
  }

  /** NumPerms-wide portable minhash signature of the trimmed text's
    * word-3-gram shingles; null for <3-token docs (mirroring the
    * `size(split(trim(text), ' ')) >= 3` filter). */
  def signature(s: UTF8String): GenericArrayData = {
    val str = s.trim.toString
    val n = str.length
    // token start offsets (segments between ' ' chars, empties included —
    // split(' ') parity; trimmed input has no leading/trailing space)
    var numTokens = 1
    var i = 0
    while (i < n) { if (str.charAt(i) == ' ') numTokens += 1; i += 1 }
    if (n == 0 || numTokens < 3) return null
    val starts = new Array[Int](numTokens + 1)
    var tok = 1
    i = 0
    while (i < n) {
      if (str.charAt(i) == ' ') { starts(tok) = i + 1; tok += 1 }
      i += 1
    }
    starts(numTokens) = n + 1 // sentinel: token t spans [starts(t), starts(t+1)-1)
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var s0 = 0
    while (s0 + 3 <= numTokens) {
      val from = starts(s0)
      val until = starts(s0 + 3) - 1 // end of third token (drop trailing sep)
      // base hash folds the shingle's code points INCLUDING the two
      // interior joining spaces — the span in the original text IS the
      // shingle (tokens are the segments between ' ' chars)
      var acc = 0L
      var j = from
      while (j < until) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      var k = 0
      while (k < NumPerms) {
        val h = (A(k) * acc + B(k)) % P
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      s0 += 1
    }
    new GenericArrayData(mins)
  }

  def signature(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PolyMinHashSigExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** DISTINCT portable base hashes of the trimmed text's word-3-gram
    * shingles, ascending; null for <3-token docs. Same span walk as
    * [[signature]] (code points INCLUDING the two interior joining
    * spaces), so each value equals the composed
    * `aggregate(split(shingle, ''), ascii-fold mod P)` of the
    * `w[i] || ' ' || w[i+1] || ' ' || w[i+2]` shingle string — the form
    * the DuckDB oracle computes. Per-document dedup happens here (sort +
    * unique) so downstream explodes move longs, not shingle strings. */
  def shingleHashes(s: UTF8String): GenericArrayData = {
    val str = s.trim.toString
    val n = str.length
    var numTokens = 1
    var i = 0
    while (i < n) { if (str.charAt(i) == ' ') numTokens += 1; i += 1 }
    if (n == 0 || numTokens < 3) return null
    val starts = new Array[Int](numTokens + 1)
    var tok = 1
    i = 0
    while (i < n) {
      if (str.charAt(i) == ' ') { starts(tok) = i + 1; tok += 1 }
      i += 1
    }
    starts(numTokens) = n + 1
    val hs = new Array[Long](numTokens - 2)
    var s0 = 0
    while (s0 + 3 <= numTokens) {
      val from = starts(s0)
      val until = starts(s0 + 3) - 1
      var acc = 0L
      var j = from
      while (j < until) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      hs(s0) = acc
      s0 += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  def shingleHashes(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PolyShingleHashesExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}

/** Array of distinct portable shingle hashes — see
  * [[PolyMinHash.shingleHashes]]. */
case class PolyShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "poly_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    PolyMinHash.shingleHashes(input.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PolyMinHash.shingleHashes($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PolyShingleHashesExpr =
    copy(child = newChild)
}

case class PolyMinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // returns null for <3-token docs even on non-null input
  override def nullable: Boolean = true
  override def prettyName: String = "poly_minhash_signature"

  override def nullSafeEval(input: Any): Any =
    PolyMinHash.signature(input.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.PolyMinHash.signature($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PolyMinHashSigExpr =
    copy(child = newChild)
}
