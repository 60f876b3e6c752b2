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
      """"price" numeric(18,2), "ts" timestamptz, "raw" bytea, "tags" text)""")
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
}
