package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Literal expectations for each Gopher rule on a hand-built corpus
  * (oracle equality is the driver gate's job). */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mk(words: Seq[String]): String = words.mkString(" ")

  // 60 ordinary words incl. two distinct stops → passes everything
  private val good = mk(Seq("the", "quick", "fox", "and") ++
    (1 to 56).map(i => s"word$i"))
  // 49 words → fails r_count only
  private val short49 = mk(Seq("the", "a") ++ (1 to 47).map(i => s"tok$i"))
  // 60 digit-only words (with stops) → fails r_alpha; mean length ok
  private val numeric = mk(Seq("the", "and") ++ (1 to 58).map(i => f"${i}%04d"))
  // 60 very long words → fails r_meanlen (mean > 10 chars)
  private val longWords = mk(Seq("the", "and") ++
    (1 to 58).map(i => "x" * 15 + i))
  // 60 words, zero stop words → fails r_stop
  private val noStops = mk((1 to 60).map(i => s"alpha$i"))

  private lazy val out: Map[Long, (Long, Long, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    Seq((1L, good), (2L, short49), (3L, numeric), (4L, longWords), (5L, noStops))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    QueryRegistry.byName("q_gopher_rules").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .toMap
  }

  test("each rule fires on exactly its designed violation") {
    //               (r_count, r_meanlen, r_alpha, r_stop, kept)
    assert(out(1L) === ((1L, 1L, 1L, 1L, 1L)), "good doc")
    assert(out(2L) === ((0L, 1L, 1L, 1L, 0L)), "49 words")
    assert(out(3L) === ((1L, 1L, 0L, 1L, 0L)), "numeric words")
    assert(out(4L) === ((1L, 0L, 1L, 1L, 0L)), "long words")
    assert(out(5L) === ((1L, 1L, 1L, 0L, 0L)), "no stop words")
  }

  test("rules bite but don't annihilate the real corpus") {
    val real = QueryRegistry.byName("q_gopher_rules")
      .run(spark, "/root/testdata/sf0.001")
    val agg = real.agg(count(lit(1)), sum(col("kept"))).head()
    val (n, kept) = (agg.getLong(0), agg.getLong(1))
    assert(kept > 0 && kept < n, s"vacuous rule set: $kept of $n")
  }
}
