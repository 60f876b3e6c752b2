package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Postgres sink (SURVEY §2.1 S5): the reference's load target, expressed
  * as Spark's JDBC writer. Connection options follow the reference's
  * CLI > env(DB_*) > default precedence (cli.py:122-127, main.py:122-142).
  *
  * Scale notes:
  *  - `df.write.jdbc` opens one connection per partition and batches
  *    inserts (`batchsize`); `repartition(numWriters)` bounds connection
  *    fan-in to what the PG instance tolerates.
  *  - `reWriteBatchedInserts=true` turns executor batches into multi-row
  *    inserts — the closest JDBC gets to pgfutter's COPY path. A true
  *    CopyManager `foreachPartition` sink is the upgrade path if the
  *    driver jar is present.
  *
  * Transport preference in [[write]]: CopyManager COPY (driver jar on the
  * classpath) > psql-subprocess COPY ([[Psql]] — the reference's own
  * transport, exec.py:117-131) > batched JDBC INSERTs. This container
  * ships no driver jar but does ship psql, so the live-server spec
  * (`graft.sink.LivePgSpec`) exercises the middle lane end-to-end against
  * a real PostgreSQL instance.
  */
object PostgresSink {

  final case class DbOptions(
      host: String = "localhost",
      port: Int = 5432,
      database: String = "postgres",
      user: String = "postgres",
      password: String = "")

  object DbOptions {
    /** CLI > env(DB_*) > default precedence (reference cli.py:122-127). */
    def resolve(
        cli: Map[String, String],
        env: Map[String, String] = sys.env): DbOptions = {
      def pick(key: String, envKey: String, dflt: String): String =
        cli.get(key).orElse(env.get(envKey)).getOrElse(dflt)
      DbOptions(
        host = pick("db-host", "DB_HOST", "localhost"),
        port = pick("db-port", "DB_PORT", "5432").toInt,
        database = pick("db-name", "DB_NAME", "postgres"),
        user = pick("db-user", "DB_USER", "postgres"),
        password = pick("db-password", "DB_PASSWORD", ""))
    }
  }

  def jdbcUrl(opts: DbOptions): String =
    s"jdbc:postgresql://${opts.host}:${opts.port}/${opts.database}"

  def writerProperties(opts: DbOptions): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", opts.user)
    p.setProperty("password", opts.password)
    p.setProperty("driver", "org.postgresql.Driver")
    p.setProperty("reWriteBatchedInserts", "true")
    p.setProperty("batchsize", "10000")
    p
  }

  /** Write a table (overwrite ≙ the reference's DROP+CREATE combine
    * target; append for incremental loads). Prefers the COPY path when the
    * PG driver is present (pgfutter-speed); falls back to batched JDBC.
    * `coalesce` (not `repartition`) bounds connection fan-in without an
    * extra shuffle and without materializing RDD lineage for a count. */
  def write(
      df: DataFrame,
      table: String,
      opts: DbOptions,
      mode: SaveMode = SaveMode.Overwrite,
      numWriters: Int = 8): Unit =
    if (CopyWriter.copyAvailable)
      CopyWriter.write(df, table, opts, overwrite = mode == SaveMode.Overwrite, numWriters)
    else if (Psql.available)
      CopyWriter.write(df, table, opts, overwrite = mode == SaveMode.Overwrite, numWriters,
        mkTarget = Some(() => Psql.copyTarget(opts)), exec = Some(Psql.exec(opts)))
    else
      df.coalesce(numWriters).write.mode(mode).jdbc(jdbcUrl(opts), table, writerProperties(opts))

  /** Statement executor for whatever transport this environment has:
    * JDBC when the driver jar is present, else the psql subprocess lane.
    * This is what the CLI wires as the hook pass-through. */
  def executor(opts: DbOptions): String => Unit =
    if (CopyWriter.copyAvailable || !Psql.available) statementExecutor(opts)
    else Psql.exec(opts)

  /** Driver-side statement executor for the hook runner's pass-through
    * lane (PG-only DDL, information_schema queries) and COPY DDL — one
    * short-lived connection per statement; hooks are rare and driver-side
    * by nature. Only invoked when a JDBC sink is configured. */
  def statementExecutor(opts: DbOptions): String => Unit = { sql =>
    val conn = java.sql.DriverManager.getConnection(jdbcUrl(opts), opts.user, opts.password)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  /** PG lane of has_column (reference hooks/functions.sql:7-13): ask the
    * sink's information_schema directly. The Spark-catalog lane lives in
    * graft.functions.Functions.hasColumn. */
  def hasColumn(opts: DbOptions, schema: String, table: String, column: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(jdbcUrl(opts), opts.user, opts.password)
    try {
      val ps = conn.prepareStatement(
        """SELECT EXISTS (SELECT 1 FROM information_schema.columns
          |WHERE table_schema = ? AND table_name = ? AND column_name = ?)""".stripMargin)
      try {
        ps.setString(1, schema); ps.setString(2, table); ps.setString(3, column)
        val rs = ps.executeQuery()
        try { rs.next(); rs.getBoolean(1) } finally rs.close()
      } finally ps.close()
    } finally conn.close()
  }
}
