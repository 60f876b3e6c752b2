package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Moore–Lewis cross-entropy-difference selection: literal expectations
  * on a hand-built two-source corpus, inline ≡ indexed on the sf0.001
  * gate corpus (oracle equality is the driver gate's job). */
class SelectOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeCorpus(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ml").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("in-domain-style doc is selected; alien doc is not (hand arithmetic)") {
    // in-domain (srcA, lexicographic min) speaks "p q"; out-domain (srcB)
    // speaks "p r" plus ONE copy of the in-domain phrase (doc 3).
    // Models: c12_in(p,q)=3, c12_in(q,p)=2, c1_in(p)=3, c1_in(q)=2;
    //         c12_out(p,r)=2, c12_out(r,p)=1, c12_out(p,q)=1,
    //         c1_out(p)=3, c1_out(r)=1.
    val dir = writeCorpus(Seq(
      (1L, "p q p q p q", "srcA"),
      (2L, "p r p r", "srcB"),
      (3L, "p q", "srcB")))
    val out = QueryRegistry.byName("q_moore_lewis").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)), r.getDouble(6), r.getLong(7))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    // doc 3 "p q": fit_in = 3/3 = 1.0, fit_out = 1/3 → selected
    val (sums3, margin3, sel3) = out(3L)
    assert(sums3 === ((1L, 3L, 3L, 1L, 3L)))
    assert(sel3 === 1L && math.abs(margin3 - (1.0 - 1.0 / 3)) < 1e-12)
    // doc 2 "p r p r": no in-domain bigram matches → fit_in 0, margin < 0
    val (sums2, margin2, sel2) = out(2L)
    assert(sums2 === ((3L, 0L, 6L, 5L, 7L)))
    assert(sel2 === 0L && margin2 < 0.0)
    // doc 1: fit_in 13/13, fit_out 3/9 → selected
    val (sums1, margin1, sel1) = out(1L)
    assert(sums1 === ((5L, 13L, 13L, 3L, 9L)))
    assert(sel1 === 1L && margin1 > 0.0)
  }

  test("every-bigram-coverage: sums over a doc count all its bigrams") {
    val dir = writeCorpus(Seq(
      (1L, "a b c", "s0"),
      (2L, "b c d", "s1")))
    val rows = QueryRegistry.byName("q_moore_lewis").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 2L, 2L -> 2L))
  }

  test("indexed lane ≡ inline lane on the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val a = QueryRegistry.byName("q_moore_lewis").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_moore_lewis_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a === b)
  }

  test("half-built model pair self-repairs: missing out-store triggers a rebuild") {
    val dir = writeCorpus(Seq(
      (1L, "p q p q", "srcA"),
      (2L, "p r p r", "srcB")))
    val (inDir, outDir) = SelectOps.ensureMlModels(spark, dir)
    // simulate a crash between the two builds: in-store present, out-store gone
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rmrf)); p.delete(); ()
    }
    rmrf(new java.io.File(outDir))
    assert(!new java.io.File(s"$outDir/pairs.parquet").exists())
    val (in2, out2) = SelectOps.ensureMlModels(spark, dir)
    assert((in2, out2) === ((inDir, outDir)))
    assert(new java.io.File(s"$outDir/pairs.parquet").exists(),
      "rebuild must fire when either store's marker is absent")
    // and the repaired pair serves the same scores as the inline lane
    val a = QueryRegistry.byName("q_moore_lewis").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = QueryRegistry.byName("q_moore_lewis_indexed").run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("single-source corpus: everything in-domain, out-model fit 0") {
    val dir = writeCorpus(Seq(
      (1L, "x y x y", "only"),
      (2L, "x y", "only")))
    val rows = QueryRegistry.byName("q_moore_lewis").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(7))).toList
    // sum_c12_out = 0 for every doc; fit_in > 0 → all selected
    assert(rows.nonEmpty && rows.forall { case (_, c12out, sel) =>
      c12out === 0L && sel === 1L })
  }
}
