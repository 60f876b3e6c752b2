package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Hand-computed expectations for the round-5 scrubbing + LM-scoring
  * operators (cross-engine exactness rides the DuckDB oracle gate; these
  * pin the semantics a consumer relies on against literal values). */
class RedactLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write a documents.parquet fixture and return its dir. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-redactlm").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_redact: every pattern found, counted, and replaced; clean rows untouched") {
    // doc 15 draws the email (15%3=0) AND phone (15%5=0) fixtures; doc 33
    // the email AND ip ones; doc 1 none. In-text PII is also caught.
    val dir = docsDir(Seq(
      (1L, "plain text with no pii at all"),
      (15L, "inline bob.smith+x@corp.example.org here"),
      (33L, "ip 8.8.8.8 inline")))
    val got = QueryRegistry.byName("q_redact").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(got(1L).getAs[Long]("n_emails") === 0L)
    assert(got(1L).getAs[Long]("n_phones") === 0L)
    assert(got(1L).getAs[Long]("n_ips") === 0L)
    assert(got(1L).getAs[String]("redacted") === "plain text with no pii at all")

    // 15: inline email + appended fixture email + appended phone
    //     (15*7%1000=105, 15*13%10000=0195)
    assert(got(15L).getAs[Long]("n_emails") === 2L)
    assert(got(15L).getAs[Long]("n_phones") === 1L)
    assert(got(15L).getAs[Long]("n_ips") === 0L)
    assert(got(15L).getAs[String]("redacted") ===
      "inline <EMAIL> here contact <EMAIL> asap call <PHONE>")

    // 33: inline ip + appended fixture email + appended ip (33%256=33,
    //     33*3%256=99)
    assert(got(33L).getAs[Long]("n_emails") === 1L)
    assert(got(33L).getAs[Long]("n_phones") === 0L)
    assert(got(33L).getAs[Long]("n_ips") === 2L)
    assert(got(33L).getAs[String]("redacted") ===
      "ip <IP> inline contact <EMAIL> asap from <IP>")
  }

  test("q_lm_bigram: counts and score match a hand-computed corpus") {
    // corpus bigrams (copy-weighted — doc 3 duplicates doc 1's text):
    //   "a b": docs 1,3 (2) + doc 2 (1) = 3;  "b a": 2;  "b c": 1
    // prefix counts: a->4 (a b ×3, a b? doc2 "a b c": a b), b->4? compute:
    //   doc1/3 "a b a b": bigrams (a b),(b a),(a b) → per copy: a×2, b×1
    //   doc2 "a b c": (a b),(b c) → a×1, b×1
    //   c1: a = 2+2+1 = 5, b = 1+1+1 = 3
    //   c12: "a b" = 2+1 = 3 (wait: doc1 has TWO "a b" per copy → 2×2+1 = 5)
    // recomputed: "a b" occurrences: doc1 2, doc3 2, doc2 1 → 5
    //   "b a": doc1 1, doc3 1 → 2;   "b c": doc2 1 → 1
    val dir = docsDir(Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "a b a b"),
      (4L, "solo")))
    val got = QueryRegistry.byName("q_lm_bigram").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

    // doc 1 = doc 3: bigrams (a b),(b a),(a b): sum_c12 = 5+2+5 = 12,
    // prefixes a,b,a: sum_c1 = 5+3+5 = 13, hapax = 0
    for (id <- Seq(1L, 3L)) {
      assert(got(id).getAs[Long]("n_bigrams") === 3L)
      assert(got(id).getAs[Long]("sum_c12") === 12L)
      assert(got(id).getAs[Long]("sum_c1") === 13L)
      assert(got(id).getAs[Long]("n_hapax") === 0L)
      assert(got(id).getAs[Double]("fit_score") === 12.0 / 13.0)
    }
    // doc 2: (a b) c12=5 c1(a)=5; (b c) c12=1 c1(b)=3 → 6/8, one hapax
    assert(got(2L).getAs[Long]("n_bigrams") === 2L)
    assert(got(2L).getAs[Long]("sum_c12") === 6L)
    assert(got(2L).getAs[Long]("sum_c1") === 8L)
    assert(got(2L).getAs[Long]("n_hapax") === 1L)
    assert(got(2L).getAs[Double]("fit_score") === 6.0 / 8.0)
    // a one-token doc has no bigrams and is excluded in both engines
    assert(!got.contains(4L))
  }

  test("q_char_diversity: hand-computed counts, mash detection, empty doc") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chardiv").toString
    Seq(
      (1L, "aaaa aaa"),   // 8 chars: a×7, space×1 → top 875 permille
      (2L, "abc"),        // 3 distinct, top 333
      (3L, ""),           // empty → all zeros
      (4L, "aaaa aaa"))   // exact copy of 1 (dedup-first path)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueryRegistry.byName("q_char_diversity").run(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars_total"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Long]("top_char_count"), r.getAs[Long]("top_char_permille"))).toMap
    assert(got(1L) === ((8L, 2L, 7L, 875L)))
    assert(got(2L) === ((3L, 3L, 1L, 333L)))
    assert(got(3L) === ((0L, 0L, 0L, 0L)))
    assert(got(4L) === got(1L))
  }

  test("q_ccnet_buckets: value-monotone tercile partition of the scored set") {
    val dir = "/root/testdata/sf0.001"
    val buckets = QueryRegistry.byName("q_ccnet_buckets").run(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("bucket"))).toMap
    val scores = QueryRegistry.byName("q_lm_bigram").run(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("fit_score")).toMap
    // exactly the scored (≥2-token) docs are bucketed
    assert(buckets.keySet === scores.keySet)
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    assert(buckets.values.map(_._2).toSet.subsetOf(order.keySet))
    assert(buckets.values.map(_._2).toSet.size === 3, "all three buckets occur")
    // within a source, buckets are a value-monotone partition: a doc in a
    // better bucket never has a lower fit score than one in a worse bucket
    buckets.groupBy(_._2._1).foreach { case (_, docs) =>
      val byBucket = docs.toSeq.groupBy(_._2._2)
        .map { case (b, ds) => b -> ds.map(d => scores(d._1)) }
      for {
        (b1, v1) <- byBucket; (b2, v2) <- byBucket
        if order(b1) < order(b2)
      } assert(v1.min >= v2.max, s"$b1 vs $b2 not monotone")
    }
  }
}
