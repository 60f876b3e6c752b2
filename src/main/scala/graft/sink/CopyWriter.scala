package graft.sink

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** COPY-protocol Postgres writer — the pgfutter-speed path the reference
  * wraps (README.md:8-9): COPY streams rows ~5-10× faster than batched
  * JDBC INSERTs. The PostgreSQL driver jar is not on this container's
  * classpath, so every driver-class touch goes through reflection and the
  * whole path is gated on [[copyAvailable]]; the row/DDL encoding — the
  * actual logic — is pure and unit-tested.
  *
  * Execution shape: `coalesce(numWriters)` bounds connection fan-in, then
  * one COPY stream per partition via `foreachPartition` — each executor
  * streams its rows straight into the server with no driver-side
  * collection, so the write scales with the cluster.
  */
object CopyWriter {

  /** True when the PostgreSQL driver (and so the COPY API) is loadable. */
  def copyAvailable: Boolean =
    try { Class.forName("org.postgresql.PGConnection"); true }
    catch { case _: ClassNotFoundException => false }

  // ---- COPY text-format encoding (pure; unit-tested) --------------------

  /** Escape one non-null field for COPY TEXT format: backslash, tab,
    * newline and carriage return are the only special characters. */
  def escapeField(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b ++= "\\\\"
        case '\t' => b ++= "\\t"
        case '\n' => b ++= "\\n"
        case '\r' => b ++= "\\r"
        case c    => b += c
      }
      i += 1
    }
    b.toString
  }

  /** Render one value in COPY TEXT format; NULL is `\N`. */
  def encodeField(v: Any): String = v match {
    case null                 => "\\N"
    case b: Array[Byte]       => "\\\\x" + b.map("%02x".format(_)).mkString
    case s: String            => escapeField(s)
    case other                => escapeField(other.toString)
  }

  /** One COPY input line: tab-separated fields, newline-terminated. */
  def encodeRow(row: Row): String = {
    val b = new StringBuilder
    var i = 0
    while (i < row.length) {
      if (i > 0) b += '\t'
      b ++= encodeField(if (row.isNullAt(i)) null else row.get(i))
      i += 1
    }
    b += '\n'
    b.toString
  }

  /** Spark type → Postgres column type for the CREATE TABLE preceding the
    * COPY (the reference's pgfutter defaults to all-text; we keep real
    * types where they exist). */
  def pgType(dt: DataType): String = dt match {
    case BooleanType                => "boolean"
    case ByteType | ShortType       => "smallint"
    case IntegerType                => "integer"
    case LongType                   => "bigint"
    case FloatType                  => "real"
    case DoubleType                 => "double precision"
    case d: DecimalType             => s"numeric(${d.precision},${d.scale})"
    case DateType                   => "date"
    case TimestampType              => "timestamptz"
    case TimestampNTZType           => "timestamp"
    case BinaryType                 => "bytea"
    case _                          => "text"
  }

  def createTableDdl(table: String, schema: StructType): String =
    schema.fields
      .map(f => s""""${f.name}" ${pgType(f.dataType)}""")
      .mkString(s"CREATE TABLE IF NOT EXISTS $table (", ", ", ")")

  /** Stream an iterator of encoded lines as a Reader — the COPY API pulls
    * from this, so a partition is never materialized in memory. */
  final class LinesReader(lines: Iterator[String]) extends java.io.Reader {
    private var buf: String = ""
    private var pos = 0
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      while (pos >= buf.length) {
        if (!lines.hasNext) return -1
        buf = lines.next(); pos = 0
      }
      val n = math.min(len, buf.length - pos)
      buf.getChars(pos, pos + n, cbuf, off)
      pos += n
      n
    }
    override def close(): Unit = ()
  }

  // ---- reflection-gated execution ---------------------------------------

  /** COPY a partition's rows into `table` over `conn` (a PG connection),
    * touching the driver's CopyManager only through reflection. */
  private def copyPartition(conn: java.sql.Connection, table: String, rows: Iterator[Row]): Long = {
    val pgConnCls = Class.forName("org.postgresql.PGConnection")
    val pgConn = conn.unwrap(pgConnCls.asInstanceOf[Class[AnyRef]])
    val copyApi = pgConnCls.getMethod("getCopyAPI").invoke(pgConn)
    val copyIn = copyApi.getClass.getMethod(
      "copyIn", classOf[String], classOf[java.io.Reader])
    copyIn.invoke(copyApi,
      s"COPY $table FROM STDIN",
      new LinesReader(rows.map(encodeRow))).asInstanceOf[java.lang.Long]
  }

  /** Full COPY write: (re)create the table through a driver-side statement,
    * then stream each partition executor-side. Requires [[copyAvailable]]. */
  def write(
      df: DataFrame,
      table: String,
      opts: PostgresSink.DbOptions,
      overwrite: Boolean = true,
      numWriters: Int = 8): Unit = {
    require(copyAvailable, "PostgreSQL driver not on the classpath; use PostgresSink.write (JDBC)")
    val exec = PostgresSink.statementExecutor(opts)
    if (overwrite) exec(s"DROP TABLE IF EXISTS $table")
    exec(createTableDdl(table, df.schema))
    val url = PostgresSink.jdbcUrl(opts)
    val (user, password) = (opts.user, opts.password)
    df.coalesce(numWriters).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url, user, password)
        try { copyPartition(conn, table, rows); () }
        finally conn.close()
      }
    }
  }
}
