package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{QueryRegistry, SparkTestSession}

/** Round-7 additions: winnowing fingerprints (independent plain-Scala
  * reference + the locality guarantee), bucketed range join (hand
  * fixture), bottom-k-sample quantile sketch (sample=all ≡ exact, and a
  * genuine-subsample case against a plain-Scala bottom-k). Cross-engine
  * exactness rides the DuckDB oracle gate; these pin semantics. */
class SketchRangeWinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val P = graft.functions.PolyMinHash.P

  // ---- independent winnowing reference (plain Scala) --------------------
  private def charFold(t: String, base: Long): Long =
    t.foldLeft(0L)((a, c) => (a * base + c.toInt) % P)

  /** (m, selected 1-based positions, selected gram hashes). */
  private def winnowRef(text: String): (Long, Seq[Int], Seq[Long]) = {
    val w = text.trim.split(" ").toSeq
    val n = w.length
    if (n < 8) return (0L, Nil, Nil)
    val h1 = w.map(charFold(_, 31))
    val m = n - 7
    val ghs = (1 to m).map(j =>
      h1.slice(j - 1, j + 7).foldLeft(0L)((a, x) => (a * 31 + x) % P))
    val wl = math.min(4, m)
    val nw = math.max(m - 3, 1)
    val sel = (1 to nw).map { j =>
      val sl = ghs.slice(j - 1, j - 1 + wl)
      j + sl.lastIndexOf(sl.min) // rightmost minimal, absolute 1-based
    }.distinct
    (m.toLong, sel, sel.map(p => ghs(p - 1)))
  }

  private def writeDocs(prefix: String,
      rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val winnowTexts = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "one two three four five six seven eight nine ten eleven twelve",
    // shares a 20-token run with doc 4 → guaranteed ≥ 2 shared fps
    3L -> ("lead in w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 " +
      "w16 w17 w18 w19 w20 tail3"),
    4L -> ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 " +
      "w16 w17 w18 w19 w20 other end4"),
    5L -> "exactly eight small tokens sit right here now", // m = 1
    6L -> "short doc under gram width") // < 8 tokens → no grams

  test("q_winnow matches the independent reference on every doc") {
    val dir = writeDocs("graft-winnow",
      winnowTexts.map { case (id, t) => (id, "s0", t) })
    val got = QueryRegistry.byName("q_winnow").run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_fp"),
          r.getAs[Long]("fp_digest"), r.getAs[Long]("pos_digest")))
      .toMap
    assert(got.size === winnowTexts.size)
    winnowTexts.foreach { case (id, text) =>
      val (m, sel, fps) = winnowRef(text)
      assert(got(id) === ((m, sel.size.toLong, fps.sum, sel.map(_.toLong).sum)),
        s"doc $id")
    }
  }

  test("winnowing locality guarantee: every gram window holds a selection") {
    winnowTexts.map(_._2).filter(_.trim.split(" ").length >= 8).foreach { t =>
      val (m, sel, _) = winnowRef(t)
      val wl = math.min(4, m.toInt)
      (1 to math.max(m.toInt - 3, 1)).foreach { j =>
        assert(sel.exists(p => p >= j && p <= j + wl - 1),
          s"window $j of '$t' has no fingerprint")
      }
    }
  }

  test("q_winnow_matches reports the shared-run pair and nothing else") {
    val dir = writeDocs("graft-winnowm",
      winnowTexts.map { case (id, t) => (id, "s0", t) })
    val rows = QueryRegistry.byName("q_winnow_matches").run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("overlap_permille")))
    assert(rows.length === 1)
    val (a, b, shared, permille) = rows.head
    assert((a, b) === ((3L, 4L)))
    // the shared 20-token run spans 13 shared grams ≥ every 4-gram window
    // in the run carries a selection → ≥ 2 shared fingerprints guaranteed
    assert(shared >= 2L)
    assert(permille > 0L && permille <= 1000L)
  }

  // ---- bucketed range join ---------------------------------------------
  test("q_range_join attributes orders across overlapping campaign windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toString
    val d0 = java.time.LocalDate.of(1995, 1, 1)
    def ts(off: Int) =
      java.sql.Timestamp.valueOf(d0.plusDays(off).atStartOfDay())
    // p1 window [d0, d0+10); p2 window [d0+2, d0+15) — overlapping
    val orders = Seq(
      (1L, ts(0), "1-URGENT"), (2L, ts(5), "1-URGENT"), (3L, ts(12), "1-URGENT"),
      (4L, ts(2), "2-HIGH"), (5L, ts(9), "2-HIGH"), (6L, ts(14), "2-HIGH"))
    orders.map { case (k, t, p) => (k, k, "O", 10.0, t, p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = QueryRegistry.byName("q_range_join").run(spark, dir).collect()
      .map(r => r.getAs[String]("priority") ->
        (r.getAs[Long]("len_days"), r.getAs[Long]("n_orders"),
          r.getAs[Double]("revenue")))
      .toMap
    assert(got.size === 2)
    // p1 window catches p1:{d0,d0+5} + p2:{d0+2,d0+9} = 4 orders
    assert(got("1-URGENT") === ((10L, 4L, 40.0)))
    // p2 window catches p2:{d0+2,d0+9,d0+14} + p1:{d0+5,d0+12} = 5 orders
    assert(got("2-HIGH") === ((13L, 5L, 50.0)))
  }

  // ---- bottom-k quantile sketch ----------------------------------------
  private def sampleHash(id: Long): Long = ((id % P) * 48271L + 11L) % P

  test("q_quantile_sketch: sample=all is exact; subsample matches bottom-k ref") {
    // s1: 10 docs (< K=64) → sample is the whole group, estimates are the
    // exact ceil-rank percentiles; s0: 100 docs → genuine 64-doc subsample
    val rows =
      (1L to 100L).map(i => (i, "s0", s"doc number $i")) ++
        (101L to 110L).map(i => (i, "s1", s"doc number $i"))
    val dir = writeDocs("graft-qsketch", rows)
    val got = QueryRegistry.byName("q_quantile_sketch").run(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sample_m"),
          r.getAs[Long]("est_p50"), r.getAs[Long]("est_p90"),
          r.getAs[Long]("est_p99")))
      .toMap
    val nchars = rows.map { case (id, _, t) => id -> t.length.toLong }.toMap
    def ref(ids: Seq[Long], k: Int): (Long, Long, Long, Long) = {
      val sample = ids.sortBy(id => (sampleHash(id), id)).take(k)
      val vals = sample.map(nchars).sorted
      def pct(p: Int) = vals((vals.size * p + 99) / 100 - 1)
      (sample.size.toLong, pct(50), pct(90), pct(99))
    }
    val (m0, a0, b0, c0) = ref((1L to 100L).toSeq, 64)
    assert(got("s0") === ((100L, m0, a0, b0, c0)))
    assert(m0 === 64L)
    val (m1, a1, b1, c1) = ref((101L to 110L).toSeq, 64)
    assert(got("s1") === ((10L, m1, a1, b1, c1)))
    assert(m1 === 10L)
  }
}
