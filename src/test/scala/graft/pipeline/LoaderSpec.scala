package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.cli.Main

/** End-to-end pipeline slice (SURVEY §7.2): animals fixture → discover →
  * all-text import → combine → post-load typed cast → reconciliation. */
class LoaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def animalsDir() = {
    val dir = Files.createTempDirectory("animals")
    Files.write(dir.resolve("animals_1.csv"),
      "name,origin,height\nGrizzly,\"North America\",220\nGiraffe,Africa,600\n".getBytes)
    Files.write(dir.resolve("animals_2.csv"),
      "name,origin,height\nWallabie,Australia,180\n".getBytes)
    dir
  }

  test("six-stage load: import, combine, check") {
    val dir = animalsDir()
    val cfg = LoaderConfig(sources = Seq(dir), combineTables = true)
    val result = new Loader(spark, cfg).load()

    assert(result.tables.keySet === Set("animals_1", "animals_2"))
    assert(result.combined.keySet === Set("animals"))
    assert(result.combined("animals").count() === 3)

    // README.md:96-105 post-load convention: typed projection over combine
    val typed = spark.sql(
      "SELECT name, origin, CAST(height AS INT) AS height FROM animals ORDER BY name")
    val rows = typed.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq === Seq(
      ("Giraffe", "Africa", 600),
      ("Grizzly", "North America", 220),
      ("Wallabie", "Australia", 180)))

    // reconciliation: csv counts include headers (2 files, 3 data rows,
    // 2 headers = 5) vs 3 combined rows → delta 2, absorbed by tolerance
    val report = result.report.get
    assert(report.tables.map(_.table) === Seq("animals"))
    assert(report.totalDelta === 2L)
    assert(!report.fatal)
  }

  test("post-load hook runs against imported views; functions registered") {
    val dir = animalsDir()
    val hook = Files.createTempFile("post", ".sql")
    Files.write(hook,
      ("CREATE OR REPLACE TEMP VIEW public_animals AS " +
        "SELECT strip(name) AS name, CAST(height AS INT) AS height FROM animals;").getBytes)
    val cfg = LoaderConfig(sources = Seq(dir), combineTables = true, postLoad = Seq(hook))
    new Loader(spark, cfg).load()
    assert(spark.sql("SELECT sum(height) FROM public_animals").collect().head.getLong(0) === 1000L)
  }

  test("packaged functions.sql installs into the JDBC lane; strip() runs in both") {
    val dir = animalsDir()
    val hook = Files.createTempFile("post", ".sql")
    Files.write(hook,
      ("CREATE OR REPLACE TEMP VIEW stripped AS SELECT strip(name) AS name FROM animals;\n" +
        "SELECT has_column('public', 'animals', 'name') FROM information_schema.columns;").getBytes)
    val executed = scala.collection.mutable.ListBuffer.empty[String]
    val cfg = LoaderConfig(sources = Seq(dir), combineTables = true, postLoad = Seq(hook))
    new Loader(spark, cfg, passThrough = Some(executed += _)).load()
    // Spark lane: registered strip() ran inside the hook view
    assert(spark.sql("SELECT count(*) FROM stripped").collect().head.getLong(0) === 3L)
    // PG lane: every packaged function definition went to the executor
    // (statements keep their leading comment blocks — match on the DDL)
    Seq("strip", "has_column", "parse_timestamp", "parse_date").foreach { n =>
      assert(executed.exists(_.contains(s"FUNCTION $n(")), s"missing $n install")
    }
    // ...and the information_schema statement was executed, not warn-skipped
    assert(executed.exists(_.contains("information_schema.columns")))
  }

  test("disable flags gate stages (tests/test_cli.py:29-68)") {
    val dir = animalsDir()
    val result = new Loader(spark,
      LoaderConfig(sources = Seq(dir), disableImport = true, disableCheck = true)).load()
    assert(result.tables.isEmpty && result.combined.isEmpty && result.report.isEmpty)
  }

  test("check-only mode: --disable-import reports db count 0, no crash") {
    // the reference tolerates check-without-import (reads whatever the DB
    // has); we must report dbCount 0 per table, not throw
    val dir = animalsDir()
    val result = new Loader(spark,
      LoaderConfig(sources = Seq(dir), disableImport = true)).load()
    assert(result.tables.isEmpty)
    val report = result.report.get
    assert(report.tables.map(_.table) === Seq("animals"))
    assert(report.tables.head.dbCount === 0L)
  }

  test("exclude regex drops matching stems (tests/test_load.py:91-120)") {
    val dir = animalsDir()
    Files.write(dir.resolve("animals_sample.csv"), "name,origin,height\nX,Y,1\n".getBytes)
    val result = new Loader(spark,
      LoaderConfig(sources = Seq(dir), excludeRegex = Some("^.*sample.*$"),
        combineTables = true, disableCheck = true)).load()
    assert(result.tables.keySet === Set("animals_1", "animals_2"))
  }

  test("cli parse: full flag surface") {
    val dir = animalsDir().toString
    val (cfg, out, level, dbOpts) = Main.parse(Seq(
      dir, "--all", "--combine-tables", "--exclude-regex", "^.*sample.*$",
      "--disable-check", "--log-level", "info", "--out-dir", "/tmp/x",
      "--max-parallel", "8",
      "--db-host", "pg.example", "--db-port", "5433"))
    assert(cfg.all && cfg.combineTables && cfg.disableCheck)
    assert(cfg.maxParallel === 8)
    assert(cfg.excludeRegex === Some("^.*sample.*$"))
    assert(out === Some("/tmp/x"))
    assert(level === "INFO")
    assert(dbOpts === Map("db-host" -> "pg.example", "db-port" -> "5433"))
    val resolved = graft.sink.PostgresSink.DbOptions.resolve(dbOpts, env = Map.empty)
    assert(resolved.host === "pg.example" && resolved.port === 5433)
    assertThrows[IllegalArgumentException](Main.parse(Seq(dir, "--bogus")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("/nonexistent-path-xyz")))
  }
}
