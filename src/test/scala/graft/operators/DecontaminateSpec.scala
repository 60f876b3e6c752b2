package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Eval-leak span removal (`q_decontaminate`): literal expectations on a
  * planted-leak corpus and the no-leaked-span-survives invariant on the
  * gate corpus. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bucketOf(id: Long): Long = ((id * 2654435761L) % 4294967296L) % 100L

  /** doc_ids landing in train (<80) / test (>=90) buckets. */
  private def idsFor(pred: Long => Boolean, n: Int): Seq[Long] =
    LazyList.from(1).map(_.toLong).filter(id => pred(bucketOf(id))).take(n).toList

  private def writeCorpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-decon").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted leak: covered tokens removed, clean docs untouched (hand arithmetic)") {
    val Seq(tr1, tr2) = idsFor(_ < 80, 2)
    val Seq(te1) = idsFor(_ >= 90, 1)
    val dir = writeCorpus(Seq(
      (te1, "a b c d"), // eval shingles: "a b c", "b c d"
      (tr1, "x y a b c z"), // leak at position 3 → tokens 3..5 removed
      (tr2, "p q r s"))) // clean
    val out = QueryRegistry.byName("q_decontaminate").run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet === Set(tr1, tr2), "exactly the train docs are emitted")
    assert(out(tr1) === ((6L, 3L, "x y z")))
    assert(out(tr2) === ((4L, 0L, "p q r s")))
  }

  test("fixpoint lane: gap re-joining creates a NEW leak that pass 1 " +
      "provably leaves and pass 2 removes") {
    val Seq(tr1) = idsFor(_ < 80, 1)
    val Seq(te1) = idsFor(_ >= 90, 1)
    // removing "a b c" (positions 3..5) from "a b a b c c" re-joins the
    // survivors into a fresh "a b c" — the single-pass documented hazard
    val dir = writeCorpus(Seq(
      (te1, "a b c"),
      (tr1, "a b a b c c")))
    val onePass = QueryRegistry.byName("q_decontaminate").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(onePass(tr1) === "a b c", "pass 1 must re-join into a new leak")
    val fixed = QueryRegistry.byName("q_decontaminate_fixpoint").run(spark, dir)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(fixed(tr1) === ((6L, 6L, "")), "pass 2 removes the re-joined leak")
  }

  test("fixpoint lane converges on the gate corpus: pass budget ≡ budget+1, " +
      "and NO eval shingle survives in the cleaned text") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.Tables.table(spark, dir, "documents")
    val evalSh = TextOps.evalShinglesOf(
      d.filter(TextOps.splitBucket >= 90).select(col("doc_id"), col("text")))
    val train = d.filter(TextOps.splitBucket < 80).select(col("doc_id"), col("text"))
    val atBudget = TextOps.cleanToFixpoint(train, evalSh)
      .collect().map(_.toSeq).toSet
    val onePast = TextOps.cleanToFixpoint(train, evalSh, TextOps.DecontamPasses + 1)
      .collect().map(_.toSeq).toSet
    assert(atBudget === onePast, "the budget must reach the fixpoint here")
    // the early exit makes the budget free past the fixpoint: a 50-pass
    // budget must produce the identical frame (and terminate in
    // fixpoint-depth passes, not 50 — this collect would crawl otherwise)
    val farPast = TextOps.cleanToFixpoint(train, evalSh, 50)
      .collect().map(_.toSeq).toSet
    assert(atBudget === farPast)
    // the cleaned corpus provably contains no eval 3-gram
    val leaks = TextOps.evalShinglesOf(
      QueryRegistry.byName("q_decontaminate_fixpoint").run(spark, dir)
        .select(col("doc_id"), col("clean_text").as("text")))
      .join(evalSh, "shingle")
    assert(leaks.count() === 0L)
  }

  test("overlapping leaks: union of covered positions, not double-removal") {
    val Seq(tr1) = idsFor(_ < 80, 1)
    val Seq(te1) = idsFor(_ >= 90, 1)
    // eval text has shingles "a b c", "b c d" → train positions 2 and 3
    // both hit; covered tokens = 2..5 (union), leaving "x z"
    val dir = writeCorpus(Seq(
      (te1, "a b c d"),
      (tr1, "x a b c d z")))
    val out = QueryRegistry.byName("q_decontaminate").run(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toList
    assert(out === List((6L, 4L, "x z")))
  }

  test("gate corpus: no original-position leaked shingle survives; counts consistent") {
    val dir = "/root/testdata/sf0.001"
    val out = QueryRegistry.byName("q_decontaminate").run(spark, dir).cache()
    try {
      assert(out.count() > 0)
      // counts: 0 <= n_removed <= n_toks, and clean token count matches
      val bad = out.filter(col("n_removed") < 0 || col("n_removed") > col("n_toks") ||
        (size(split(col("clean_text"), " ")) =!= col("n_toks") - col("n_removed") &&
          !(col("clean_text") === "" && col("n_toks") === col("n_removed"))))
      assert(bad.count() === 0)
      // the decontaminated corpus shares no shingle with the eval split
      // at any ORIGINAL leaked position — verified the strong way: re-run
      // the contamination join over the CLEANED train shingle sets and
      // require that every shingle shared with eval is one CREATED by gap
      // re-joining (i.e. absent from the doc's original shingle set)
      val docs = graft.Tables.table(spark, dir, "documents")
      val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))
      def shingles(df: org.apache.spark.sql.DataFrame, textCol: String) = df
        .select(col("doc_id"), split(trim(col(textCol)), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), size(col("w")) - 2),
            i => concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1), element_at(col("w"), i + 2))))).as("shingle"))
      val evalSh = shingles(docs.filter(bucket >= 90), "text")
        .select(col("shingle")).distinct()
      val cleanShared = shingles(out.select(col("doc_id"), col("clean_text")), "clean_text")
        .join(evalSh, "shingle")
      val originalSh = shingles(docs.filter(bucket < 80), "text")
      val surviving = cleanShared.join(originalSh, Seq("doc_id", "shingle"), "left_semi")
      assert(surviving.count() === 0,
        "an originally-present leaked shingle survived the rewrite")
      // and the corpus genuinely had leaks to remove (fixture not vacuous)
      assert(out.filter(col("n_removed") > 0).count() > 0)
    } finally { out.unpersist(); () }
  }
}
