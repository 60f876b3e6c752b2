package graft.sink

import org.scalatest.funsuite.AnyFunSuite

class PostgresSinkSpec extends AnyFunSuite {
  import PostgresSink._

  test("db options: CLI > env > default precedence (cli.py:122-127)") {
    val opts = DbOptions.resolve(
      cli = Map("db-host" -> "clihost"),
      env = Map("DB_HOST" -> "envhost", "DB_PORT" -> "5433", "DB_USER" -> "envuser"))
    assert(opts.host === "clihost")  // CLI wins
    assert(opts.port === 5433)       // env fallback
    assert(opts.user === "envuser")  // env fallback
    assert(opts.database === "postgres") // default
  }

  test("jdbc url and writer properties") {
    val opts = DbOptions(host = "h", port = 5, database = "d", user = "u", password = "p")
    assert(jdbcUrl(opts) === "jdbc:postgresql://h:5/d")
    val props = writerProperties(opts)
    assert(props.getProperty("reWriteBatchedInserts") === "true")
    assert(props.getProperty("user") === "u")
  }
}
