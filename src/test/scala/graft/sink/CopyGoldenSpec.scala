package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file tests of the exact COPY text-format byte stream.
  *
  * The network half of the COPY sink can't run in this container (no PG
  * server or driver jar), but the bytes we'd send are fully determined by
  * the encoder — and COPY text format is a stable, documented wire spec.
  * These specs freeze the stream for a DataFrame covering every supported
  * type (DST-boundary instants, arrays with quoting/escaping, NULL vs
  * empty string, tab/newline/CR/backslash payloads, NaN/Infinity, bytea)
  * against a checked-in golden file, so any escaping regression shows up
  * in review as a golden diff instead of at first deployment.
  *
  * Regenerate after an intentional format change with:
  *   GOLDEN_REGEN=1 sbt "testOnly graft.sink.CopyGoldenSpec"
  * then review the diff of src/test/resources/graft/copy_golden.txt.
  */
class CopyGoldenSpec extends AnyFunSuite {
  import CopyWriter._

  private val goldenResource = "/graft/copy_golden.txt"
  private val goldenSourcePath =
    Paths.get("src/test/resources/graft/copy_golden.txt")

  private val schema = StructType(Seq(
    StructField("flag", BooleanType),
    StructField("tiny", ByteType),
    StructField("small", ShortType),
    StructField("num", IntegerType),
    StructField("big", LongType),
    StructField("real", FloatType),
    StructField("dbl", DoubleType),
    StructField("dec", DecimalType(18, 2)),
    StructField("txt", StringType),
    StructField("day", DateType),
    StructField("ts", TimestampType),
    StructField("ntz", TimestampNTZType),
    StructField("raw", BinaryType),
    StructField("tags", ArrayType(StringType)),
    StructField("nums", ArrayType(LongType)),
    StructField("stamps", ArrayType(TimestampType))))

  // Instants chosen on DST boundaries: springGap falls inside the
  // America/New_York 2024-03-10 spring-forward gap (02:30 EST does not
  // exist locally); fallBack falls inside the 2024-11-03 ambiguous hour.
  // Both must render as fixed UTC wall clocks with an explicit +00:00
  // offset, byte-identical regardless of the JVM default zone.
  private val springGap = java.time.Instant.parse("2024-03-10T07:30:00Z")
  private val fallBack  = java.time.Instant.parse("2024-11-03T05:30:00.123456Z")

  private def fixtureRows: Seq[Row] = Seq(
    Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.25,
      new java.math.BigDecimal("12345.67"),
      "tab\there newline\nhere cr\rhere backslash\\here",
      java.sql.Date.valueOf("2024-03-10"),
      java.sql.Timestamp.from(springGap),
      java.time.LocalDateTime.of(2024, 3, 31, 2, 30, 0),
      Array[Byte](0x00, 0x0a, -1),
      Seq("a", null, "b\"c", "d\\e", "t\tab"),
      Seq(1L, 2L, 3L),
      Seq(java.sql.Timestamp.from(fallBack))),
    Row(null, null, null, null, null, null, null, null, null, null, null,
      null, null, null, null, null),
    Row(false, -1.toByte, -2.toShort, -3, -4L, Float.NaN,
      Double.PositiveInfinity, new java.math.BigDecimal("-0.50"),
      "", // empty string must stay distinct from \N
      java.sql.Date.valueOf("1999-12-31"),
      java.sql.Timestamp.from(fallBack),
      java.time.LocalDateTime.of(1999, 12, 31, 23, 59, 59, 999999000),
      Array.emptyByteArray,
      Seq.empty[String],
      Seq(null, 0L),
      Seq.empty[java.sql.Timestamp]))

  /** The stream exactly as `write` would send it: one COPY payload through
    * the CopyTarget seam, single writer so row order is the input order. */
  private def actualStream(): String = {
    val spark = graft.SparkTestSession.spark
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(fixtureRows).asJava), schema)
    CopyCapture.reset()
    write(df, "import.golden", PostgresSink.DbOptions(), numWriters = 1,
      mkTarget = Some(() => CopyCapture.newTarget()),
      exec = Some(_ => ()))
    import scala.jdk.CollectionConverters._
    CopyCapture.payloads.asScala.mkString
  }

  private def golden(): String = {
    val in = getClass.getResourceAsStream(goldenResource)
    assert(in != null, s"golden file missing: $goldenResource — run with GOLDEN_REGEN=1 once")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  test("full write-path byte stream matches the checked-in golden file") {
    val actual = actualStream()
    if (sys.env.contains("GOLDEN_REGEN")) {
      Files.createDirectories(goldenSourcePath.getParent)
      Files.write(goldenSourcePath, actual.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $goldenSourcePath (${actual.length} bytes)")
    } else {
      assert(actual === golden())
    }
  }

  test("DDL for the full-coverage schema is stable") {
    assert(createTableDdl("import.golden", schema) ===
      "CREATE TABLE IF NOT EXISTS import.golden (" +
      "\"flag\" boolean, \"tiny\" smallint, \"small\" smallint, " +
      "\"num\" integer, \"big\" bigint, \"real\" real, " +
      "\"dbl\" double precision, \"dec\" numeric(18,2), \"txt\" text, " +
      "\"day\" date, \"ts\" timestamptz, \"ntz\" timestamp, " +
      "\"raw\" bytea, \"tags\" text[], \"nums\" bigint[], " +
      "\"stamps\" timestamptz[])")
  }

  test("instant encoding is byte-identical across JVM default time zones") {
    // The DST-boundary instants must not shift when an executor runs in a
    // different zone: the encoder formats in UTC with an explicit offset.
    val zones = Seq("America/New_York", "Pacific/Chatham", "UTC")
    val dflt = java.util.TimeZone.getDefault
    try {
      val renders = zones.map { z =>
        java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone(z))
        (encodeField(java.sql.Timestamp.from(springGap)),
          encodeField(java.sql.Timestamp.from(fallBack)),
          encodeField(fallBack))
      }
      assert(renders.distinct.size === 1)
      assert(renders.head._1 === "2024-03-10 07:30:00.000000+00:00")
      assert(renders.head._2 === "2024-11-03 05:30:00.123456+00:00")
    } finally java.util.TimeZone.setDefault(dflt)
  }

  test("golden stream round-trips the COPY escaping rules") {
    // Sanity on the checked-in bytes themselves: unescape the second
    // field layer and confirm NULL/empty/escape semantics survived.
    val lines = golden().split("\n", -1).dropRight(1)
    assert(lines.length === 3)
    val fields = lines.map(_.split("\t", -1))
    assert(fields.forall(_.length === schema.length))
    // row 2 is all NULLs
    assert(fields(1).forall(_ === "\\N"))
    // row 3's txt is the empty string, not NULL
    assert(fields(2)(8) === "")
    // row 1's txt field carries escaped control chars, never raw ones
    val txt = fields(0)(8)
    assert(txt.contains("\\t") && txt.contains("\\n") && txt.contains("\\r"))
    assert(!txt.exists(c => c == '\t' || c == '\n' || c == '\r'))
    // NaN / Infinity use PG's accepted spellings
    assert(fields(2)(5) === "NaN" && fields(2)(6) === "Infinity")
    // bytea hex prefix arrives with the COPY-escaped double backslash
    assert(fields(0)(12) === "\\\\x000aff")
  }
}
