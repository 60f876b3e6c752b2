package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The native Catalyst expressions must agree exactly with the
  * reference-shaped Column compositions on every branch and edge. */
class NativeVsComposedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    "31-JAN-19 03.20.00.000000000 PM +01:00",
    "31-JAN-19 03.20.00 PM +01:00",
    "28-MAR-19 05.02.10.000000000 AM GMT",
    "28-MAR-19 05.02.10 AM GMT",
    "20190101013449+0000",
    "20190101013449+0130",
    "01-JAN-19 12.00.00 AM +00:00",
    "01-JAN-19 12.00.00 PM +00:00",
    "31-JAN-19 03.20.00.123456789 PM +00:00",
    "29-FEB-19 01.00.00 AM GMT", // invalid date
    "99-JAN-19 01.00.00 AM GMT", // invalid day
    "31-XXX-19 01.00.00 AM GMT", // invalid month
    "garbage", "", "2019-01-01 00:00:00")

  test("parse_timestamp: native expression == composed built-ins") {
    val df = corpus.toDF("s").select(
      col("s"),
      Functions.parseTimestamp(col("s")).as("native"),
      Functions.parseTimestampComposed(col("s")).as("composed"))
    df.collect().foreach { r =>
      assert(r.get(1) === r.get(2), s"mismatch for input '${r.getString(0)}'")
    }
  }

  test("minhash signature: native expression == composed min(xxhash64) agg") {
    val inline = Seq(
      (0L, "a b c d e"),
      (1L, "a b c"),
      (2L, "a b"), // <3 tokens → dropped
      (3L, ""), // dropped
      (4L, "x  y z w"), // double space → empty token
      (5L, "a b c a b c a b c"), // duplicate shingles
      (6L, "  padded text here now  ")).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(inline, real)) {
      val w = split(trim(col("text")), " ")
      val sh = docs
        .select(col("doc_id"), when(size(w) >= 3, array_distinct(
          transform(sequence(lit(1), size(w) - 2), i => concat_ws(" ",
            element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))).as("shs"))
        .select(col("doc_id"), explode(col("shs")).as("shingle"))
      val sigCols = (0 until MinHash.NumPerms).map(k =>
        min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
      val composed = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .select(col("doc_id"),
          array((0 until MinHash.NumPerms).map(k => col(s"h$k")): _*).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = docs
        .select(col("doc_id"), MinHash.signature(col("text")).as("sig"))
        .filter(col("sig").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native.keySet === composed.keySet)
      native.foreach { case (id, sig) =>
        assert(sig === composed(id), s"signature mismatch for doc $id")
      }
    }
  }

  test("minhash signature: property — random unicode/whitespace corpora agree") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tokens with multibyte UTF-8, empties via double spaces, punctuation
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("ä", "日本", "é!", "", "x"))
    val doc = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(8, doc)) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val w = split(trim(col("text")), " ")
      val sh = docs
        .select(col("doc_id"), when(size(w) >= 3, array_distinct(
          transform(sequence(lit(1), size(w) - 2), i => concat_ws(" ",
            element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))).as("shs"))
        .select(col("doc_id"), explode(col("shs")).as("shingle"))
      val sigCols = (0 until MinHash.NumPerms).map(k =>
        min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
      val composed = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .select(col("doc_id"),
          array((0 until MinHash.NumPerms).map(k => col(s"h$k")): _*).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = docs
        .select(col("doc_id"), MinHash.signature(col("text")).as("sig"))
        .filter(col("sig").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      native == composed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  /** Composed Column formulation of the portable minhash signature —
    * the reference shape PolyMinHash must agree with bit-for-bit. */
  private def composedPolySig(docs: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.types.LongType
    val P = PolyMinHash.P
    val pa = typedLit(PolyMinHash.A.toSeq)
    val pb = typedLit(PolyMinHash.B.toSeq)
    val w = split(trim(col("text")), " ")
    val shs = array_distinct(
      transform(sequence(lit(1), size(w) - 2), i => concat_ws(" ",
        element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
    val bh = transform(shs, s => aggregate(
      transform(split(s, ""), c => ascii(c).cast(LongType)),
      lit(0L), (acc, c) => (acc * 31 + c) % P))
    // <3-token docs filtered up front (`tokenized` parity — a `when` here
    // would yield an array of 16 nulls, not a null array)
    docs.filter(size(w) >= 3)
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(PolyMinHash.NumPerms - 1)), k =>
          array_min(transform(bh, h =>
            (element_at(pa, k + 1) * h + element_at(pb, k + 1)) % P))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  private def nativePolySig(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), PolyMinHash.signature(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("portable minhash signature: native expression == composed HOF fold") {
    val inline = Seq(
      (0L, "a b c d e"),
      (1L, "a b c"),
      (2L, "a b"), // <3 tokens → dropped
      (3L, ""), // dropped
      (4L, "x  y z w"), // double space → empty token
      (5L, "a b c a b c a b c"), // duplicate shingles
      (6L, "  padded text here now  "),
      (7L, "ümlaut tökens ärē fine")).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(inline, real)) {
      val composed = composedPolySig(docs)
      val native = nativePolySig(docs)
      assert(native.keySet === composed.keySet)
      native.foreach { case (id, sig) =>
        assert(sig === composed(id), s"portable signature mismatch for doc $id")
      }
    }
  }

  test("portable minhash signature: property — random BMP corpora agree") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // BMP tokens only: Spark's split(s, "") walks code UNITS, so astral
    // chars diverge between composed and any formulation — out of the
    // portable contract (the oracle corpus is ASCII)
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("ä", "日本", "é!", "", "x"))
    val doc = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(8, doc)) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      composedPolySig(docs) == nativePolySig(docs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("shingle hashes: native expression == composed per-shingle HOF fold") {
    import org.apache.spark.sql.types.LongType
    val P = PolyMinHash.P
    val w = split(trim(col("text")), " ")
    val shs = array_distinct(
      transform(sequence(lit(1), size(w) - 2), i => concat_ws(" ",
        element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
    val inline = Seq(
      (0L, "a b c d e"),
      (1L, "a b c"),
      (2L, "a b"), // <3 tokens → dropped
      (3L, ""), // dropped
      (4L, "x  y z w"), // double space → empty token
      (5L, "a b c a b c a b c"), // duplicate shingles → deduped
      (6L, "  padded text here now  ")).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(inline, real)) {
      val composed = docs.filter(size(w) >= 3)
        .select(col("doc_id"), array_sort(array_distinct(transform(shs, s =>
          aggregate(transform(split(s, ""), c => ascii(c).cast(LongType)),
            lit(0L), (acc, c) => (acc * 31 + c) % P)))).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = docs
        .select(col("doc_id"), PolyMinHash.shingleHashes(col("text")).as("hs"))
        .filter(col("hs").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native.keySet === composed.keySet)
      native.foreach { case (id, hs) =>
        assert(hs === composed(id), s"shingle hash set mismatch for doc $id")
      }
    }
  }

  test("repetition stats: native expression == composed HOF formulation") {
    import org.apache.spark.sql.types.LongType
    val w = split(trim(col("text")), " ")
    val n = size(w).cast(LongType)
    val maxTok = array_max(transform(array_distinct(w),
      t => size(filter(w, x => x === t)).cast(LongType)))
    def gram(g: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
      val grams = transform(sequence(lit(1), size(w) - (g - 1)),
        i => concat_ws(" ", (0 until g).map(j => element_at(w, i + j)): _*))
      (when(size(w) >= g + 1, size(array_distinct(grams)).cast(LongType))
        .otherwise(lit(0L)),
        when(size(w) >= g + 1, size(grams).cast(LongType)).otherwise(lit(0L)))
    }
    val (d2, t2) = gram(2)
    val (d3, t3) = gram(3)
    val inline = Seq(
      (0L, "a b c d e"),
      (1L, "x y x y x y"), // heavy 2-gram repetition
      (2L, "a"), // single token: no grams
      (3L, "a b"), // n == 2: 2-gram total guarded to 0 (n < g+1)
      (4L, "a b c"), // n == 3: 3-gram guarded, 2-grams real
      (5L, ""), // empty → one empty token
      (6L, "x  y z w"), // double space → empty token counts
      (7L, "t t t t t t t t")).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(inline, real)) {
      val composed = docs.select(col("doc_id"),
        array(n, maxTok, d2, t2, d3, t3).as("st"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = docs.select(col("doc_id"),
        graft.functions.RepetitionStats.stats(col("text")).as("st"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native.keySet === composed.keySet)
      native.foreach { case (id, st) =>
        assert(st === composed(id), s"repetition counters mismatch for doc $id")
      }
    }
  }

  test("char diversity: native expression == composed explode-shaped formulation") {
    import org.apache.spark.sql.types.LongType
    val chars = split(col("text"), "")
    val total = length(col("text")).cast(LongType)
    val nd = size(array_distinct(chars)).cast(LongType)
    val top = array_max(transform(array_distinct(chars),
      c => size(filter(chars, x => x === c)).cast(LongType)))
    val composedSt = when(length(col("text")) > 0, array(total, nd, top))
      .otherwise(array(lit(0L), lit(0L), lit(0L)))
    val inline = Seq(
      (0L, "abcabc"),
      (1L, "aaaaaaa"), // single-char text: top == total, nd == 1
      (2L, "a"),
      (3L, ""), // empty → [0,0,0] (the funnel's null-fill branch)
      (4L, "a b  c"), // spaces are characters too
      (5L, "ü ü ö"), // non-ASCII BMP
      (6L, "the quick brown fox")).toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(inline, real)) {
      val composed = docs.select(col("doc_id"), composedSt.as("st"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = docs.select(col("doc_id"),
        graft.functions.CharDiversity.stats(col("text")).as("st"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native.keySet === composed.keySet)
      native.foreach { case (id, st) =>
        assert(st === composed(id), s"char-diversity counters mismatch for doc $id")
      }
    }
  }

  test("repetition stats + shingle hashes: property — random BMP corpora agree") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.types.LongType
    // same BMP-only contract as the portable-minhash property (split(s,'')
    // walks code units, so astral chars are out of the portable contract)
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("ä", "日本", "é!", "", "x", "x x"))
    val doc = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString(" "))
    val w = split(trim(col("text")), " ")
    val n = size(w).cast(LongType)
    val maxTok = array_max(transform(array_distinct(w),
      t => size(filter(w, x => x === t)).cast(LongType)))
    def gram(g: Int): Seq[org.apache.spark.sql.Column] = {
      val grams = transform(sequence(lit(1), size(w) - (g - 1)),
        i => concat_ws(" ", (0 until g).map(j => element_at(w, i + j)): _*))
      Seq(when(size(w) >= g + 1, size(array_distinct(grams)).cast(LongType))
        .otherwise(lit(0L)),
        when(size(w) >= g + 1, size(grams).cast(LongType)).otherwise(lit(0L)))
    }
    val composedShs = array_sort(array_distinct(transform(
      array_distinct(transform(sequence(lit(1), size(w) - 2), i => concat_ws(" ",
        element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))),
      s => aggregate(transform(split(s, ""), c => ascii(c).cast(LongType)),
        lit(0L), (acc, c) => (acc * 31 + c) % PolyMinHash.P))))
    val prop = Prop.forAll(Gen.listOfN(6, doc)) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val composed = docs.select(col("doc_id"),
        array((Seq(n, maxTok) ++ gram(2) ++ gram(3)): _*).as("st"),
        when(size(w) >= 3, composedShs).as("hs"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), Option(r.getSeq[Long](2)))).toMap
      val native = docs.select(col("doc_id"),
        graft.functions.RepetitionStats.stats(col("text")).as("st"),
        graft.functions.PolyMinHash.shingleHashes(col("text")).as("hs"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1), Option(r.getSeq[Long](2)))).toMap
      native == composed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("dot product: native expression == composed aggregate(zip_with) fold") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val paired = real.as("a").crossJoin(real.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val r = paired.select(
      VectorOps.dot(col("va"), col("vb")).as("native"),
      aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("composed"),
      VectorOps.dot(col("va"), col("va")).as("native_sq"),
      aggregate(col("va"), lit(0.0), (a, x) => a + x * x).as("composed_sq"))
      .collect()
    r.foreach { row =>
      // bit-identical, not approximately equal
      assert(row.getDouble(0) === row.getDouble(1))
      assert(row.getDouble(2) === row.getDouble(3))
    }
    assert(r.length === 500)
  }

  test("cell assignment: native expression == composed transform/array_position form") {
    // real vectors against a centroid table derived from the corpus
    // itself (so distances land close and ties are plausible), plus a
    // literal exact-tie fixture pinning the first-minimum tie-break
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents: Seq[(Long, Seq[Double])] = real.limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    def composed(v: org.apache.spark.sql.Column) = {
      val sorted = cents.sortBy(_._1)
      val centArr = array(sorted.map { case (_, cv) => array(cv.map(lit): _*) }: _*)
      val clusterArr = array(sorted.map(c => lit(c._1)): _*)
      def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)
      val dists = transform(centArr, cv => dist2(v, cv))
      struct(
        element_at(clusterArr, array_position(dists, array_min(dists)).cast("int"))
          .as("cluster"),
        array_min(dists).as("d2c"))
    }
    val r = real.select(
      CellAssign.assign(cents, col("v")).as("n"), composed(col("v")).as("c"))
      .select(col("n.cluster"), col("c.cluster"), col("n.d2c"), col("c.d2c"))
      .collect()
    assert(r.length === 500)
    r.foreach { row =>
      assert(row.getLong(0) === row.getLong(1))
      assert(row.getDouble(2) === row.getDouble(3)) // bit-identical
    }
    // exact tie: two identical centroids under different ids — the FIRST
    // (smaller id) must win in both forms
    val tieCents: Seq[(Long, Seq[Double])] =
      Seq(7L -> Seq(1.0, 2.0), 3L -> Seq(1.0, 2.0), 9L -> Seq(5.0, 5.0))
    val tie = spark.range(1).select(typedlit(Seq(1.0, 2.5)).as("v"))
      .select(CellAssign.assign(tieCents, col("v")).getField("cluster").as("n"))
      .head().getLong(0)
    assert(tie === 3L, "first-minimum tie-break must pick the smaller cluster id")
  }

  test("parse_date: native expression == composed built-ins") {
    val dates = Seq("01-FEB-19", "01-Feb-19", "29-FEB-19", "29-FEB-20",
      "31-APR-19", "nope", "")
    val df = dates.toDF("s").select(
      col("s"),
      Functions.parseDate(col("s")).as("native"),
      Functions.parseDateComposed(col("s")).as("composed"))
    df.collect().foreach { r =>
      assert(r.get(1) === r.get(2), s"mismatch for input '${r.getString(0)}'")
    }
  }

  test("poly gram hashes: native expression == composed HOF chain") {
    import org.apache.spark.sql.types.LongType
    val P = PolyMinHash.P
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog today",
      "a b c d e f g h", // exactly 8 tokens → one gram
      "a b c d e f g", // 7 tokens → null
      "", // empty → null
      "x  y z w q r s t u", // double space → empty token folds to 0
      "  padded with leading and trailing spaces a b c  ",
      "unicode tökens schön así 漢字 mixed in here too",
      "t t t t t t t t t t") // identical tokens
    for ((w, tb, gb) <- Seq((8, 31, 31), (8, 131, 37), (3, 31, 31))) {
      def charFold(t: org.apache.spark.sql.Column, base: Int) =
        aggregate(transform(split(t, ""), c => ascii(c).cast(LongType)),
          lit(0L), (a, c) => (a * base + c) % P)
      val toks = split(trim(col("s")), " ")
      val h = transform(toks, t => charFold(t, tb))
      val composed = when(size(toks) >= w,
        transform(sequence(lit(1), size(toks) - (w - 1)),
          j => aggregate(slice(h, j, lit(w)), lit(0L),
            (a, x) => (a * gb + x) % P)))
      val df = texts.toDF("s").select(
        col("s"),
        PolyGramHashes.gramHashes(col("s"), w, tb, gb).as("native"),
        composed.as("composed"))
      df.collect().foreach { r =>
        assert(r.get(1) === r.get(2),
          s"mismatch for input '${r.getString(0)}' (w=$w, tb=$tb, gb=$gb)")
      }
    }
  }

  test("poly gram hashes: property — native == composed on random docs") {
    import org.apache.spark.sql.types.LongType
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val P = PolyMinHash.P
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("ä", "日本", "é!", "", "x"))
    val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(8, doc)) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def charFold(t: org.apache.spark.sql.Column, base: Int) =
        aggregate(transform(split(t, ""), c => ascii(c).cast(LongType)),
          lit(0L), (a, c) => (a * base + c) % P)
      val toks = split(trim(col("text")), " ")
      val h = transform(toks, t => charFold(t, 31))
      val composed = when(size(toks) >= 8,
        transform(sequence(lit(1), size(toks) - 7),
          j => aggregate(slice(h, j, lit(8)), lit(0L),
            (a, x) => (a * 31 + x) % P)))
      docs.select(
        col("doc_id"),
        PolyGramHashes.gramHashes(col("text"), 8, 31, 31).as("native"),
        composed.as("composed"))
        .collect().forall(r => r.get(1) === r.get(2))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
