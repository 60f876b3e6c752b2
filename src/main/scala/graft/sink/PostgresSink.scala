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
  *    driver jar is present (it is not in this container, so the writer
  *    stays on plain JDBC and is exercised in tests via options-building
  *    only).
  *
  * No Postgres server or JDBC driver exists in this environment, so
  * `write` is untested end-to-end here by construction; everything up to
  * the driver handoff is unit-tested.
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
    * target; append for incremental loads). */
  def write(
      df: DataFrame,
      table: String,
      opts: DbOptions,
      mode: SaveMode = SaveMode.Overwrite,
      numWriters: Int = 8): Unit = {
    val bounded = if (df.rdd.getNumPartitions > numWriters) df.repartition(numWriters) else df
    bounded.write.mode(mode).jdbc(jdbcUrl(opts), table, writerProperties(opts))
  }
}
