package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Upper-triangle Gram matrix (Σ q·qᵀ) over int8-quantized vectors as a
  * typed Aggregator — the integer-exact precursor to covariance/PCA/
  * whitening over an embedding corpus.
  *
  * The buffer is ONE fixed d(d+1)/2 long array: each partition folds its
  * vectors locally (map-side combine) and the shuffle moves one buffer
  * per partition — never the corpus. The d²-explode + groupBy((i,j))
  * formulation the oracle uses would push |corpus|·d²/2 rows into the
  * aggregation instead (the oracle's job is exactness, not scale).
  *
  * Integer bounds: |q| ≤ 127 so each product is ≤ 16129 and the BIGINT
  * sum is exact to ~5.7e14 vectors — no overflow at any realistic scale.
  */
class GramAggregator(dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val len = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
    val arr = q.toArray
    require(arr.length == dim, s"expected dim-$dim vector, got ${arr.length}")
    var idx = 0
    var i = 0
    while (i < dim) {
      val qi = arr(i)
      var j = i
      while (j < dim) {
        buf(idx) += qi * arr(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
