package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The q_char_diversity NULL-fill contract (round-11 advisory close):
  * the native [[graft.functions.CharDiversity]] expression is
  * null-propagating, but the lane coalesces to the empty-doc counters —
  * a corpus carrying a NULL text must score [0,0,0,0], matching the
  * COUNT-based DuckDB oracle's empty-group behavior, not NULL. */
class CharDiversityNullSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("NULL and empty texts score the zero counters, not NULL") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "aab"))
      .toDF("doc_id", "text")
    val got = TextOps.charDiversityOf(docs).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1L -> ((0L, 0L, 0L, 0L)),
      2L -> ((0L, 0L, 0L, 0L)),
      3L -> ((3L, 2L, 2L, 666L))))
  }
}
