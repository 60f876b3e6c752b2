package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmin-cell assignment against a frozen centroid table —
  * returns struct(cluster, d2c) in ONE tight generated loop.
  *
  * The composed form (`transform(centroids, cv -> dist2(v, cv))` +
  * `array_position(array_min(...))`) evaluates k interpreted
  * `zip_with`+`aggregate` folds per row, each allocating an intermediate
  * 64-element array — at production cell counts (k ≈ √N, round 8) that
  * is k×2 allocations and ~k×dim lambda steps per vector, and it
  * dominated q_semantic_dedup at the sf1 stress (13.8 s warm; see
  * PERF.md). This expression is the same arithmetic — per centroid the
  * identical left fold ((0+(d₀)²)+(d₁)²)+…, first-minimum tie-break on
  * the cluster-id-sorted order (strict `<` keeps the first minimum,
  * exactly `array_position`'s first match) — so assignments and
  * distances are bit-identical to the composed form and the unrolled
  * DuckDB oracles (parity spec: NativeVsComposedSpec).
  */
object CellAssign {
  def assign(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CellAssignExpr(org.apache.spark.sql.GraftSqlBridge.expression(v),
        cents.sortBy(_._1).toIndexedSeq))
}

case class CellAssignExpr(
    child: Expression,
    cents: IndexedSeq[(Long, Seq[Double])]) extends UnaryExpression {
  require(cents.nonEmpty, "CellAssignExpr needs at least one centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("d2c", DoubleType, nullable = false)))
  override def prettyName: String = "cell_assign"

  @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val dim: Int = cents.head._2.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)._2
      var i = 0
      while (i < dim) { a(c * dim + i) = cv(i); i += 1 }
      c += 1
    }
    a
  }

  /** The whole evaluation, shared by interpreted and generated paths. */
  def assign(v: ArrayData): InternalRow = {
    val n = math.min(v.numElements(), dim)
    var best = Double.PositiveInfinity
    var bestId = ids(0)
    var c = 0
    while (c < ids.length) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < n) {
        val d = v.getDouble(i) - flat(off + i)
        acc += d * d
        i += 1
      }
      // strict < keeps the FIRST minimum on the id-sorted order — the
      // array_position tie-break of the composed form
      if (acc < best) { best = acc; bestId = ids(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestId, best))
  }

  override def nullSafeEval(v: Any): Any = assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellAssign", this, classOf[CellAssignExpr].getName)
    defineCodeGen(ctx, ev, v => s"$ref.assign($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CellAssignExpr =
    copy(child = newChild)
}
