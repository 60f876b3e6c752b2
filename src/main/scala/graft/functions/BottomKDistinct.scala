package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact bottom-k DISTINCT values as a bounded-buffer `Aggregator` — the
  * KMV sketch construction ([[graft.operators.CorpusOps]] q_kmv_*) as one
  * aggregation instead of a rank window (round 17, r16 verdict #4):
  * the buffer is a sorted, duplicate-free list capped at k, so partial
  * aggregation ships ≤k longs per group per partition and no per-source
  * sort ever materializes — `slice(sort(distinct(h)), 1, k)` with
  * bounded state at any corpus size. Insertion is O(k) per row with an
  * O(1)-alloc reject for values at or above a full buffer's max, which
  * is the asymptotic case (k·ln(n/k) accepted inserts over n random
  * draws). Deterministic: the bottom-k of a set does not depend on
  * arrival order, so map-side combine and merge order cannot change the
  * result ([[TopKAggregator]]'s contract, value-sorted).
  */
class BottomKDistinct(k: Int)
    extends Aggregator[Long, List[Long], Seq[Long]] {

  private def insert(buf: List[Long], x: Long): List[Long] = {
    val (before, after) = buf.span(_ < x)
    if (after.headOption.contains(x)) buf // already present
    else if (before.lengthCompare(k) >= 0) buf // full and x above max
    else {
      val merged = before ::: x :: after
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
  }

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], x: Long): List[Long] = insert(buf, x)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
