package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The COPY path's encoding logic is pure and tested here; the network
  * half is reflection-gated on the PG driver jar, absent in this
  * container — copyAvailable === false documents that honestly. */
class CopyWriterSpec extends AnyFunSuite {
  import CopyWriter._

  test("COPY text-format field escaping") {
    assert(escapeField("plain") === "plain")
    assert(escapeField("a\tb") === "a\\tb")
    assert(escapeField("a\nb") === "a\\nb")
    assert(escapeField("a\rb") === "a\\rb")
    assert(escapeField("a\\b") === "a\\\\b")
  }

  test("field encoding: nulls, bytes, scalars") {
    assert(encodeField(null) === "\\N")
    assert(encodeField("x\ty") === "x\\ty")
    assert(encodeField(Array[Byte](0x0a, 0x7f, -1)) === "\\\\x0a7fff")
    assert(encodeField(42L) === "42")
    assert(encodeField(3.5) === "3.5")
  }

  test("row encoding is tab-separated, newline-terminated") {
    val line = encodeRow(Row("a", null, 7L, "t\tab"))
    assert(line === "a\t\\N\t7\tt\\tab\n")
  }

  test("DDL generation maps Spark types to PG types") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("price", DecimalType(18, 2)),
      StructField("ts", TimestampType),
      StructField("raw", BinaryType),
      StructField("tags", ArrayType(StringType))))
    assert(createTableDdl("import.t", schema) ===
      """CREATE TABLE IF NOT EXISTS import.t ("id" bigint, "name" text, """ +
      """"price" numeric(18,2), "ts" timestamptz, "raw" bytea, "tags" text[])""")
  }

  test("timestamps are rendered in UTC with an explicit offset") {
    // Timestamp.toString would format this in the JVM default tz with no
    // offset; the COPY encoding must be tz-independent.
    val inst = java.time.Instant.parse("2024-01-02T03:04:05.123456Z")
    assert(encodeField(java.sql.Timestamp.from(inst)) ===
      "2024-01-02 03:04:05.123456+00:00")
    assert(encodeField(inst) === "2024-01-02 03:04:05.123456+00:00")
    assert(encodeField(java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)) ===
      "2024-01-02 03:04:05.000000")
  }

  test("array columns encode as PG array literals, not Scala debug strings") {
    assert(encodeField(Seq(1L, 2L, 3L)) === """{"1","2","3"}""")
    assert(encodeField(Seq("a", null, "b\"c", "d\\e")) ===
      """{"a",NULL,"b\\"c","d\\\\e"}""")
  }

  test("non-atomic columns are rejected up front") {
    val ok = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType))))
    assert(unsupportedColumns(ok) === Seq.empty)
    val bad = StructType(Seq(
      StructField("m", MapType(StringType, LongType)),
      StructField("nested", ArrayType(ArrayType(LongType)))))
    assert(unsupportedColumns(bad).length === 2)
  }

  test("LinesReader streams an iterator without materializing it") {
    val lines = Iterator("ab\n", "", "cdef\n")
    val r = new LinesReader(lines)
    val buf = new Array[Char](3)
    assert(r.read(buf, 0, 3) === 3 && new String(buf) === "ab\n")
    assert(r.read(buf, 0, 3) === 3 && new String(buf) === "cde")
    assert(r.read(buf, 0, 3) === 2 && new String(buf, 0, 2) === "f\n")
    assert(r.read(buf, 0, 3) === -1)
  }

  test("copy path is reflection-gated on the missing driver") {
    assert(!copyAvailable)
    val e = intercept[IllegalArgumentException] {
      write(null, "t", PostgresSink.DbOptions())
    }
    assert(e.getMessage.contains("PostgreSQL driver"))
  }

  test("write streams every partition through the CopyTarget seam") {
    // the full write path — DDL statements, partition fan-in bound, COPY
    // sql, row encoding, close-per-stream — up to the connection boundary
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    CopyCapture.reset()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c\td"), (4L, "e")).toDF("id", "name")
    write(df, "import.t", PostgresSink.DbOptions(), numWriters = 2,
      mkTarget = Some(() => CopyCapture.newTarget()),
      exec = Some(CopyCapture.statements.add(_)))
    import scala.jdk.CollectionConverters._
    assert(CopyCapture.statements.asScala.toSeq === Seq(
      "CREATE SCHEMA IF NOT EXISTS import", // pgfutter-parity implicit schema
      "DROP TABLE IF EXISTS import.t",
      """CREATE TABLE IF NOT EXISTS import.t ("id" bigint, "name" text)"""))
    assert(CopyCapture.sqls.asScala.toSet === Set("COPY import.t FROM STDIN"))
    val copied = CopyCapture.payloads.asScala.mkString
      .split("\n").filter(_.nonEmpty).toSet
    assert(copied === Set("1\ta", "2\tb", "3\tc\\td", "4\te"))
    // every opened stream was closed; fan-in bounded by numWriters
    assert(CopyCapture.opened.get() === CopyCapture.closed.get())
    assert(CopyCapture.opened.get() > 0 && CopyCapture.opened.get() <= 2)
  }

  test("losing a concurrent CREATE SCHEMA race is tolerated, other DDL errors are not") {
    // PostgreSQL's IF NOT EXISTS check is not concurrency-safe: a parallel
    // table load can create the schema between our check and create, and
    // the server dies on the pg_namespace unique index. That exact failure
    // must be swallowed (the schema exists); anything else must propagate.
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    CopyCapture.reset()
    val df = Seq((1L, "a")).toDF("id", "name")
    val raceError = "psql exited 3: ERROR:  duplicate key value violates " +
      "unique constraint \"pg_namespace_nspname_index\" | " +
      "DETAIL:  Key (nspname)=(import) already exists."
    write(df, "import.t", PostgresSink.DbOptions(), numWriters = 1,
      mkTarget = Some(() => CopyCapture.newTarget()),
      exec = Some { sql =>
        if (sql.startsWith("CREATE SCHEMA")) throw new RuntimeException(raceError)
        CopyCapture.statements.add(sql); ()
      })
    // the write proceeded past the lost race: table DDL was still issued
    import scala.jdk.CollectionConverters._
    assert(CopyCapture.statements.asScala.toSeq === Seq(
      "DROP TABLE IF EXISTS import.t",
      """CREATE TABLE IF NOT EXISTS import.t ("id" bigint, "name" text)"""))
    // a non-race failure on the same statement is NOT swallowed
    val boom = intercept[RuntimeException] {
      write(df, "import.t", PostgresSink.DbOptions(), numWriters = 1,
        mkTarget = Some(() => CopyCapture.newTarget()),
        exec = Some { sql =>
          if (sql.startsWith("CREATE SCHEMA"))
            throw new RuntimeException("psql exited 2: could not connect to server")
          ()
        })
    }
    assert(boom.getMessage.contains("could not connect"))
  }
}

/** Static capture sink for the executor-side fake CopyTargets (local-mode
  * executors share the JVM, so statics are visible to the assertions). */
object CopyCapture {
  val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]
  val sqls = new java.util.concurrent.ConcurrentLinkedQueue[String]
  val payloads = new java.util.concurrent.ConcurrentLinkedQueue[String]
  val opened = new java.util.concurrent.atomic.AtomicInteger
  val closed = new java.util.concurrent.atomic.AtomicInteger

  def reset(): Unit = {
    statements.clear(); sqls.clear(); payloads.clear()
    opened.set(0); closed.set(0)
  }

  def newTarget(): CopyWriter.CopyTarget = new CopyWriter.CopyTarget {
    opened.incrementAndGet()
    override def copyIn(sql: String, data: java.io.Reader): Long = {
      sqls.add(sql)
      val sb = new StringBuilder
      val buf = new Array[Char](256)
      var n = data.read(buf, 0, buf.length)
      while (n >= 0) { sb.appendAll(buf, 0, n); n = data.read(buf, 0, buf.length) }
      payloads.add(sb.toString)
      sb.toString.count(_ == '\n').toLong
    }
    override def close(): Unit = { closed.incrementAndGet(); () }
  }
}
