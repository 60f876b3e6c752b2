package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY §2.11 surface; preference tier (b) of
  * the custom-operator ladder): exact per-group top-k as an
  * `Aggregator[IN, BUF, OUT]` with a bounded buffer — the buffer never
  * exceeds k entries, so partial aggregation ships k rows per partition
  * per group instead of the whole group (the win over the
  * window-row_number formulation at scale is precisely that map-side
  * combine).
  *
  * Ordering: score descending, id ascending tie-break — total and
  * deterministic, matching a `ROW_NUMBER() OVER (ORDER BY score DESC, id)`
  * oracle.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    val (before, after) = buf.span(lt(_, x))
    val merged = before ::: x :: after
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
