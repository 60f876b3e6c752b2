package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class DedupOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("connectedComponents: chains, cliques and isolated pairs converge to min labels") {
    // components: {1,2,3,4} as a chain (needs propagation across hops),
    // {10,11,12} as a triangle, {20,21} as a lone pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("d1", "d2")
    val labels = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long path exercises multi-round propagation") {
    // a 12-node path: min label must travel the full diameter
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = DedupOps.connectedComponents(pairs).collect()
    assert(labels.length === 12)
    assert(labels.forall(_.getLong(1) === 1L))
  }

  test("connectedComponents: uses reliable checkpoints when a checkpoint dir is set") {
    // cluster-grade lane: with a checkpoint dir configured the iteration
    // must run through Dataset.checkpoint (survives executor loss) and
    // still converge across ≥3 rounds (a 12-node path forces that)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
      val labels = DedupOps.connectedComponents(pairs).collect()
      assert(labels.length === 12)
      assert(labels.forall(_.getLong(1) === 1L))
      // the reliable lane actually wrote RDD checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the checkpoint dir")
    } finally {
      // other suites share this session — leave no checkpoint dir behind
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("native LSH propose drops oversized band buckets, keeps sane ones") {
    import org.apache.spark.sql.functions._
    // 1001 DISTINCT texts with identical shingle SETS (cyclic rotations
    // of one token cycle share every 3-gram) hash to identical MinHash
    // signatures, putting 1001 distinct texts in every band bucket —
    // past MaxBandBucket, so the native LSH lane proposes NOTHING for
    // the family (a bucket this degenerate is boilerplate, not signal);
    // a 3-copy text stays under the cap and pairs as exact 1.0s
    val n = 1001
    val cycle = Array.tabulate(n)(i => s"t$i")
    val hot = (0 until n).map { i =>
      val toks = (0 until n + 2).map(j => cycle((i + j) % n))
      (i.toLong, toks.mkString(" "))
    }
    val sane = (2000L until 2003L).map(i =>
      (i, "one two three four five six seven eight nine"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cap").toString
    (hot ++ sane).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = graft.QueryRegistry.byName("q_dedup_minhash")
      .run(spark, dir)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((2000L, 2001L), (2000L, 2002L), (2001L, 2002L)),
      s"hot bucket must be capped, sane copies must pair: $pairs")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("two-stage verified dedup == all-pairs exact jaccard on the fixture") {
    import org.apache.spark.sql.functions._
    // ground truth: brute-force EXACT jaccard over string shingle sets,
    // every pair, no df cap — what the propose/verify pipeline promises
    // to reproduce (LSH recall on same-signature/near-dup pairs + exact
    // verification). 500 docs → 125k pairs: fine in a test.
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2)))).as("shs"))
    val a = docs.select(col("doc_id").as("d1"), col("shs").as("s1"))
    val b = docs.select(col("doc_id").as("d2"), col("shs").as("s2"))
    val exact = a.crossJoin(b).filter(col("d1") < col("d2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("s1")) + size(col("s2")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("d1"), col("d2"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val verified = graft.QueryRegistry.byName("q_dedup_minhash_verified")
      .run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(verified === exact,
      s"missing=${(exact -- verified).take(5)} extra=${(verified -- exact).take(5)}")
  }

  test("q_block_rewrite keeps only each block's first occurrence, rebuilds in order") {
    import org.apache.spark.sql.functions._
    val P = (1 to 16).map(i => s"p$i").mkString(" ") // one full 16-token block
    val tmp = java.nio.file.Files.createTempDirectory("graft-blockrw").toString
    Seq(
      (1L, s"$P u1 u2"),     // blocks: [P, "u1 u2"] — both first occurrences
      (2L, s"$P $P u3"),     // both P copies lose to (1,0); "u3" unique
      (3L, s"$P u1 u2"))     // exact copy of doc 1 — every block dropped
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.QueryRegistry.byName("q_block_rewrite").run(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === ((2L, 2L, s"$P u1 u2")))
    assert(got(2L) === ((3L, 1L, "u3")))
    assert(got(3L) === ((2L, 0L, "")))
  }
}
