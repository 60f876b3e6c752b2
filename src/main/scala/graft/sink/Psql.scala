package graft.sink

import java.nio.charset.StandardCharsets

/** psql-subprocess Postgres lane — the reference's own transport
  * (exec.py:117-131 shells out to `psql`; the pgfutter path is likewise an
  * external binary). When the JDBC driver jar is absent but the `psql`
  * client is installed, this lane carries the exact same COPY text stream
  * as [[CopyWriter]]'s CopyManager path — `COPY ... FROM STDIN` over a
  * pipe instead of the wire protocol — so the golden-frozen encoder bytes
  * reach a real server unchanged.
  *
  * Execution shape matches the JDBC COPY path: one `psql` process per
  * partition stream (spawned executor-side inside `foreachPartition`), no
  * driver-side collection. On a real cluster this requires the psql
  * client on executor images — the same operational contract as the
  * reference requiring pgfutter/psql on its host. Statement execution and
  * catalog queries are driver-side, one short-lived process each (hooks
  * and DDL are rare by nature).
  *
  * Unix-socket support falls out of psql's own `-h`: a `host` beginning
  * with '/' is a socket directory, which is how the live test lane talks
  * to its throwaway server without binding a TCP port.
  */
object Psql {

  /** Absolute path of the psql binary, if one is on PATH. */
  lazy val binary: Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparatorChar)
      .iterator
      .map(d => new java.io.File(d, "psql"))
      .find(f => f.isFile && f.canExecute)
      .map(_.getAbsolutePath)

  def available: Boolean = binary.isDefined

  /** Connection arguments shared by every invocation. `-X` skips psqlrc
    * (a host's startup file must not change our session), ON_ERROR_STOP
    * turns SQL errors into a non-zero exit we can throw on. */
  def connArgs(opts: PostgresSink.DbOptions): Seq[String] = Seq(
    "-h", opts.host, "-p", opts.port.toString,
    "-U", opts.user, "-d", opts.database,
    "-X", "-v", "ON_ERROR_STOP=1")

  private def newProcess(opts: PostgresSink.DbOptions, extra: Seq[String]): Process = {
    val cmd = binary.getOrElse(
      throw new IllegalStateException("psql not on PATH")) +: (connArgs(opts) ++ extra)
    val pb = new ProcessBuilder(cmd: _*)
    if (opts.password.nonEmpty) pb.environment().put("PGPASSWORD", opts.password)
    pb.start()
  }

  private def drain(in: java.io.InputStream): String =
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()

  /** Sequential concatenation of readers (for the inline-COPY script:
    * statement, payload, terminator). */
  private final class ConcatReader(parts: java.io.Reader*) extends java.io.Reader {
    private val it = parts.iterator
    private var cur: java.io.Reader = if (it.hasNext) it.next() else null
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      while (cur != null) {
        val n = cur.read(cbuf, off, len)
        if (n >= 0) return n
        cur.close()
        cur = if (it.hasNext) it.next() else null
      }
      -1
    }
    override def close(): Unit = if (cur != null) cur.close()
  }

  /** Run one psql invocation; the SQL script arrives on STDIN, never in
    * argv — process arguments pass through the JVM's native encoding
    * (`sun.jnu.encoding`, plain ASCII under the POSIX locale this kind of
    * container runs), which silently turns non-ASCII statement bytes into
    * `?`. Stdin is an OutputStream we encode as UTF-8 ourselves. Throws
    * with the server's stderr on a non-zero exit (ON_ERROR_STOP). */
  private def run(
      opts: PostgresSink.DbOptions,
      extra: Seq[String],
      script: java.io.Reader): String = {
    val p = newProcess(opts, extra)
    // stderr drains on its own thread FROM THE START: a child emitting
    // enough stderr (server NOTICEs during a large COPY) to fill the pipe
    // buffer while we are still writing stdin blocks psql — and therefore
    // us — in a mutual-pipe deadlock if stderr is only read afterwards.
    val stderrRef = new java.util.concurrent.atomic.AtomicReference[String]("")
    val stderrThread = new Thread(() =>
      stderrRef.set(try drain(p.getErrorStream) catch { case _: Exception => "" }))
    stderrThread.setDaemon(true)
    stderrThread.start()
    def capturedStderr: String = {
      stderrThread.join(10000)
      stderrRef.get()
    }
    val out = new java.io.OutputStreamWriter(p.getOutputStream, StandardCharsets.UTF_8)
    try {
      try {
        val buf = new Array[Char](64 * 1024)
        var n = script.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = script.read(buf) }
      } finally out.close()
    } catch {
      // a broken pipe mid-write means psql died — the interesting
      // diagnostics are on ITS stderr, not in the IOException
      case e: java.io.IOException =>
        p.waitFor()
        throw new RuntimeException(
          s"psql stdin write failed (${e.getMessage}): " +
            capturedStderr.linesIterator.take(5).mkString(" | "), e)
    }
    val stdout = drain(p.getInputStream)
    val code = p.waitFor()
    if (code != 0)
      throw new RuntimeException(
        s"psql exited $code: ${capturedStderr.linesIterator.take(5).mkString(" | ")}")
    stdout
  }

  private def statementReader(sql: String) =
    new java.io.StringReader(if (sql.trim.endsWith(";")) sql + "\n" else sql + ";\n")

  /** Driver-side statement executor — the pass-through seam for
    * [[graft.hooks.SqlHookRunner]] and [[graft.hooks.PgFunctions]] when no
    * JDBC driver is present. */
  def exec(opts: PostgresSink.DbOptions)(sql: String): Unit = {
    run(opts, Seq("-q"), statementReader(sql)); ()
  }

  /** Tuples-only query: rows as tab-separated lines (`-tA` + tab field
    * separator mirrors COPY's own field framing). */
  def query(opts: PostgresSink.DbOptions, sql: String): Seq[String] =
    run(opts, Seq("-tA", "-F", "\t"), statementReader(sql))
      .linesIterator.toSeq

  /** PG lane of has_column via information_schema — same contract as
    * [[PostgresSink.hasColumn]] without needing the driver jar. */
  def hasColumn(
      opts: PostgresSink.DbOptions,
      schema: String, table: String, column: String): Boolean = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    query(opts,
      s"""SELECT EXISTS (SELECT 1 FROM information_schema.columns
         |WHERE table_schema = ${q(schema)} AND table_name = ${q(table)}
         |AND column_name = ${q(column)})""".stripMargin).headOption.contains("t")
  }

  /** A [[CopyWriter.CopyTarget]] that streams each COPY payload through a
    * psql subprocess. One process per `copyIn` call; the factory closure
    * captures only `opts` (a serializable case class), so partitions spawn
    * their own processes executor-side. */
  def copyTarget(opts: PostgresSink.DbOptions): CopyWriter.CopyTarget =
    new CopyWriter.CopyTarget {
      override def copyIn(sql: String, data: java.io.Reader): Long = {
        // one psql script: the COPY statement, the payload inline, then
        // the \. terminator — the same framing as a pg_dump text restore.
        // A payload line can never alias the terminator: COPY text format
        // escapes every literal backslash as \\. No -q, because the
        // "COPY <n>" command tag is the row count we return.
        val script = new ConcatReader(
          statementReader(sql), data, new java.io.StringReader("\\.\n"))
        run(opts, Seq.empty, script)
          .linesIterator
          .collectFirst { case l if l.startsWith("COPY ") => l.drop(5).trim.toLong }
          .getOrElse(0L)
      }
      override def close(): Unit = ()
    }
}
