package graft.hooks

import scala.io.Source

/** The packaged Postgres-dialect function library (SURVEY §7.4 risk 1).
  *
  * The reference installs `hooks/functions.sql` into Postgres after every
  * import (main.py:203-208) so hook scripts can call strip()/
  * parse_timestamp()/... server-side. graft ships the same surface twice:
  *  - Spark lane: `Functions.registerAll` (codegen'd Column expressions);
  *  - PG lane: this packaged script, installed through the pass-through
  *    executor whenever a JDBC sink is configured.
  */
object PgFunctions {

  /** The packaged script (resource `graft/functions.sql`). */
  lazy val script: String = {
    val in = getClass.getResourceAsStream("/graft/functions.sql")
    require(in != null, "packaged graft/functions.sql missing from classpath")
    try Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Individual installable statements (comment/quote-aware split). */
  def statements: Seq[String] = SqlHookRunner.splitStatements(script)

  /** Install every function through `execute` (a JDBC statement executor
    * when a PG sink is configured). Returns the number installed. */
  def install(execute: String => Unit): Int = {
    statements.foreach(execute)
    statements.size
  }
}
