package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Hand-computed expectations for the round-7 operators: exact
  * duplicate-substring spans (Lee-et-al-style W=8 window dedup with
  * interval merge) and the Laplace-smoothed fixed-point bag-of-words
  * classifier. Cross-engine exactness rides the DuckDB oracle gate; these
  * pin the semantics against literal values. */
class SpanClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(prefix: String, rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_substring_dedup: cross-doc spans, interval merge, copies, short docs") {
    val dir = docsDir("graft-span", Seq(
      // 1/2 share the 8-run a1..a8 (at pos 1 and pos 2 respectively)
      (1L, "en", "a1 a2 a3 a4 a5 a6 a7 a8 x1 x2"),
      (2L, "en", "b0 a1 a2 a3 a4 a5 a6 a7 a8 b1"),
      // 3: no duplicated window anywhere
      (3L, "en", "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      // 4: within-doc repetition — 3 overlapping identical windows merge
      // into ONE whole-doc span
      (4L, "en", "t t t t t t t t t t"),
      // 5/6 share TWO disjoint 8-runs → two islands each
      (5L, "en", "p1 p2 p3 p4 p5 p6 p7 p8 g1 g2 g3 q1 q2 q3 q4 q5 q6 q7 q8"),
      (6L, "en", "z0 p1 p2 p3 p4 p5 p6 p7 p8 z1 q1 q2 q3 q4 q5 q6 q7 q8 z2"),
      // 7/8: exact copies — duplication comes from the copy count alone
      (7L, "en", "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
      (8L, "en", "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
      // 9: shorter than W — no windows at all
      (9L, "en", "s1 s2 s3 s4 s5")))
    val got = QueryRegistry.byName("q_substring_dedup").run(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("dup_permille")))
      .toMap
    assert(got.size === 9)
    assert(got(1L) === ((10L, 1L, 8L, 800L)))  // span [1,8]
    assert(got(2L) === ((10L, 1L, 8L, 800L)))  // span [2,9]
    assert(got(3L) === ((10L, 0L, 0L, 0L)))
    assert(got(4L) === ((10L, 1L, 10L, 1000L))) // merged whole-doc island
    assert(got(5L) === ((19L, 2L, 16L, 842L)))  // [1,8] + [12,19]
    assert(got(6L) === ((19L, 2L, 16L, 842L)))  // [2,9] + [11,18]
    assert(got(7L) === ((9L, 1L, 9L, 1000L)))   // dup via the exact copy
    assert(got(8L) === ((9L, 1L, 9L, 1000L)))
    assert(got(9L) === ((5L, 0L, 0L, 0L)))
  }

  test("q_classify_freq: smoothed fixed-point scores, unseen tokens, tie-break") {
    // train (doc_id % 5 != 0): en "cat dog cat", fr "chat chien chat"
    // → N_en = N_fr = 3, V = 4, so the smoothing denominator is 7:
    //   s(cat,en) = 3e9//7 = 428571428   s(dog,en) = 2e9//7 = 285714285
    //   s(chat,fr) = 428571428           s(chien,fr) = 285714285
    //   cross-class and unseen floor: 1e9//7 = 142857142
    val dir = docsDir("graft-classify", Seq(
      (1L, "en", "cat dog cat"),
      (2L, "fr", "chat chien chat"),
      (5L, "en", "cat dog"),    // en 714285713 vs fr 285714284 → en, correct
      (10L, "fr", "chat noir"), // noir unseen; fr 571428570 vs en 285714284 → fr
      (15L, "fr", "zzz")))      // all-unseen → exact tie → lang-asc pick "en"
    val got = QueryRegistry.byName("q_classify_freq").run(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang"),
          r.getAs[Long]("score"), r.getAs[Long]("is_correct")))
      .toMap
    assert(got.size === 3)
    assert(got(5L) === (("en", "en", 714285713L, 1L)))
    assert(got(10L) === (("fr", "fr", 571428570L, 1L)))
    assert(got(15L) === (("fr", "en", 142857142L, 0L)))

    // the evaluation report over the same holdout: n_true(en)=1, n_true(fr)=2
    val eval = QueryRegistry.byName("q_classify_eval").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("share_permille")))
      .toMap
    assert(eval === Map(
      ("en", "en") -> ((1L, 1000L)),
      ("fr", "fr") -> ((1L, 500L)),
      ("fr", "en") -> ((1L, 500L))))
  }
}
