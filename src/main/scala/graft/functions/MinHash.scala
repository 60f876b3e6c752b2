package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over word-3-gram shingles.
  *
  * Bit-for-bit equal to the composed formulation
  * `groupBy(doc).agg(min(xxhash64(lit(k), shingle)) for k < 32)` over
  * `explode(array_distinct(shingles))` — but with NO explode and NO
  * shuffle: the signature is a scalar expression on the document row
  * (min over a multiset equals min over its distinct set, so shingle
  * dedup is free). At sf1 the composed path shuffled 2.6M exploded
  * shingle rows into a 32-column aggregation; this computes the same 32
  * longs inside whole-stage codegen.
  *
  * Exactness: seeds replicate Spark's `xxhash64(lit(k), shingle)` chain —
  * seed_k = XXH64.hashInt(k, 42); each shingle is hashed zero-copy as the
  * byte range spanning three consecutive tokens (rejoining tokens with
  * ' ' reproduces exactly the original byte span, since tokens are the
  * segments between ' ' bytes).
  */
object MinHash {
  val NumPerms = 32

  /** xxhash64's default seed is 42; lit(k) hashes first in the chain. */
  private val seeds: Array[Long] =
    Array.tabulate(NumPerms)(k => XXH64.hashInt(k, 42L))

  /** 32-minhash signature of the trimmed text's word-3-gram shingles;
    * null (`None` here) when the text has fewer than 3 tokens —
    * mirroring the `size(split(trim(text), ' ')) >= 3` filter. */
  def signature(s: UTF8String): GenericArrayData = {
    val t = s.trim
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val n = t.numBytes
    // token start offsets (segments between ' ' bytes, empties included —
    // split(' ') parity; trimmed input has no leading/trailing space)
    var numTokens = 1
    var i = 0
    while (i < n) { if (t.getByte(i) == ' ') numTokens += 1; i += 1 }
    if (numTokens < 3) return null
    val starts = new Array[Int](numTokens + 1)
    var tok = 1
    i = 0
    while (i < n) {
      if (t.getByte(i) == ' ') { starts(tok) = i + 1; tok += 1 }
      i += 1
    }
    starts(numTokens) = n + 1 // sentinel: token t spans [starts(t), starts(t+1)-1)
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var s0 = 0
    while (s0 + 3 <= numTokens) {
      val from = starts(s0)
      val until = starts(s0 + 3) - 1 // end of third token (drop trailing sep)
      var k = 0
      while (k < NumPerms) {
        val h = XXH64.hashUnsafeBytes(base, off + from, until - from, seeds(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      s0 += 1
    }
    new GenericArrayData(mins)
  }

  def signature(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashSigExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // returns null for <3-token docs even on non-null input
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[UTF8String])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHash.signature($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
