package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Live-PostgreSQL round-trip — the lane every previous round had to leave
  * `partial`: the container ships server binaries (postgres 15 + psql), so
  * the golden-frozen COPY byte stream, the packaged function library, the
  * hook pass-through lane and the reconciliation check all run against a
  * REAL server here (reference main.py:250-306, exec.py:117-131).
  *
  * The suite owns a throwaway cluster: initdb into a unique /tmp dir (the
  * `postgres` system user cannot traverse /root), listen on a unix socket
  * only (no TCP port to collide with), stop + delete on exit. Every test
  * self-cancels when the environment lacks the binaries or root — the
  * suite stays green on hosts without PostgreSQL.
  */
class LivePgSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val spark = graft.SparkTestSession.spark

  private def sh(cmd: String): (Int, String) = {
    val p = new ProcessBuilder("/bin/sh", "-c", cmd)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def haveBinary(name: String): Boolean = sh(s"command -v $name")._1 == 0

  /** The server must run as a non-root system user; `su postgres` is only
    * possible when the suite itself runs as root (this container does). */
  private lazy val envReady: Boolean =
    !sys.env.get("PG").contains("0") &&
      haveBinary("psql") && haveBinary("su") &&
      sh("command -v initdb || command -v /usr/lib/postgresql/*/bin/initdb")._1 == 0 &&
      sh("id -u")._2.trim == "0" && sh("id postgres")._1 == 0

  private val baseDir = s"/tmp/graft-livepg-${java.util.UUID.randomUUID().toString.take(8)}"
  private val dataDir = s"$baseDir/data"
  private var serverUp = false

  private def asPg(cmd: String): (Int, String) =
    sh(s"""su postgres -s /bin/sh -c "cd /tmp && $cmd"""")

  private lazy val opts =
    PostgresSink.DbOptions(host = baseDir, port = 5432,
      database = "postgres", user = "postgres")

  override def beforeAll(): Unit = {
    if (envReady) {
      Files.createDirectories(Paths.get(baseDir))
      sh(s"chown postgres:postgres $baseDir")
      val (initCode, initOut) = asPg(s"initdb -D $dataDir -A trust -E UTF8")
      val (startCode, startOut) = if (initCode == 0)
        asPg(s"pg_ctl -D $dataDir -l $baseDir/log " +
          s"""-o \\"-c listen_addresses='' -k $baseDir\\" start -w -t 30""")
      else (initCode, initOut)
      serverUp = startCode == 0 &&
        (try { Psql.query(opts, "SELECT 1").headOption.contains("1") }
         catch { case _: Exception => false })
      if (!serverUp)
        info(s"live PG unavailable: init=$initCode start=$startCode " +
          (initOut + startOut).linesIterator.take(3).mkString(" | "))
    }
  }

  override def afterAll(): Unit = {
    if (serverUp) asPg(s"pg_ctl -D $dataDir stop -m immediate -w -t 30")
    if (envReady) { sh(s"rm -rf $baseDir"); () }
  }

  private def live(name: String)(body: => Unit): Unit =
    test(name) { assume(envReady && serverUp, "no live PostgreSQL in this environment"); body }

  // ---- the golden fixture, now against real bytes-on-a-real-server ------

  private val springGap = java.time.Instant.parse("2024-03-10T07:30:00Z")

  live("COPY stream is accepted by a real COPY FROM STDIN and round-trips") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("txt", StringType),
      StructField("dbl", DoubleType),
      StructField("ts", TimestampType),
      StructField("raw", BinaryType),
      StructField("tags", ArrayType(StringType))))
    val rows = Seq(
      Row(1L, "tab\there newline\nhere backslash\\here", 2.25,
        java.sql.Timestamp.from(springGap), Array[Byte](0x00, 0x0a, -1),
        Seq("a", null, "b\"c")),
      Row(2L, null, null, null, null, null),
      Row(3L, "", Double.NaN, null, Array.emptyByteArray, Seq.empty[String]))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

    // full production entry point: no driver jar -> psql COPY lane
    PostgresSink.write(df, "copy_rt", opts, SaveMode.Overwrite, numWriters = 2)

    val got = Psql.query(opts,
      """SELECT id, coalesce(txt, '<null>'), coalesce(dbl::text, '<null>'),
        |       coalesce(to_char(ts AT TIME ZONE 'UTC', 'YYYY-MM-DD HH24:MI:SS'), '<null>'),
        |       coalesce(encode(raw, 'hex'), '<null>'),
        |       coalesce(array_to_string(tags, ',', '*'), '<null>')
        |FROM copy_rt ORDER BY id""".stripMargin)
    assert(got === Seq(
      // control chars arrive as real bytes server-side; psql -tA renders
      // them raw, so the first row spans three output lines
      "1\ttab\there newline",
      "here backslash\\here\t2.25\t2024-03-10 07:30:00\t000aff\ta,*,b\"c",
      "2\t<null>\t<null>\t<null>\t<null>\t<null>",
      "3\t\tNaN\t<null>\t\t"))
  }

  live("overwrite is idempotent: DROP+CREATE semantics, re-run converges") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    PostgresSink.write(df, "rerun_t", opts, SaveMode.Overwrite, numWriters = 1)
    PostgresSink.write(df, "rerun_t", opts, SaveMode.Overwrite, numWriters = 1)
    assert(Psql.query(opts, "SELECT count(*) FROM rerun_t") === Seq("2"))
  }

  live("packaged functions.sql installs and agrees with the Spark lane") {
    val n = graft.hooks.PgFunctions.install(Psql.exec(opts))
    assert(n > 0)
    // strip() on a deliberately nasty input: leading CRLF (trimmed),
    // embedded double quotes (removed), and NON-ASCII chars (U+00A0, é) —
    // the latter caught a real transport bug: SQL passed via `-c` argv is
    // mangled by the JVM's native argument encoding under the POSIX
    // locale, which is why Psql ships statements over stdin.
    val input = "\r\n\u00A0\"x\" \u00E9 y\t"
    val expected = "\u00A0x \u00E9 y\t"
    val pg = Psql.query(opts, s"SELECT strip(E'${input
      .replace("\t", "\\t").replace("\r", "\\r").replace("\n", "\\n")}')").head
    import spark.implicits._
    val sp = Seq(input).toDF("s")
      .select(graft.functions.Functions.strip(org.apache.spark.sql.functions.col("s")))
      .as[String].head()
    assert(pg === expected)
    assert(sp === expected)
    // has_column(): the PG-side definition vs the direct catalog probe
    assert(Psql.query(opts,
      "SELECT has_column('public', 'rerun_t', 'id')").head === "t")
    assert(Psql.hasColumn(opts, "public", "rerun_t", "id"))
    assert(!Psql.hasColumn(opts, "public", "rerun_t", "nope"))
  }

  live("hook pass-through lane executes PG-only DDL on the live server") {
    val dir = Files.createTempDirectory("graft-hooks")
    val script = dir.resolve("post.sql")
    Files.write(script,
      """CREATE TABLE hook_clone (LIKE rerun_t INCLUDING ALL);
        |""".stripMargin.getBytes("UTF-8"))
    // the LIKE clone classifies as pass-through and lands on the server
    val report = graft.hooks.SqlHookRunner.runScript(
      spark, script, passThrough = Psql.exec(opts))
    assert(report.failed === 0 && report.passedThrough === 1)
    Psql.exec(opts)("INSERT INTO hook_clone SELECT * FROM rerun_t")
    assert(Psql.query(opts, "SELECT count(*) FROM hook_clone") === Seq("2"))
  }

  live("reference workflow e2e: zip -> discover -> CSV -> live PG -> hooks -> reconcile") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // the reference's whole reason to exist, on a real server: a source
    // dir holding a zip of CSVs plus a bare CSV, loaded through the exact
    // CLI wiring (psql COPY lane, import.* schema, functions.sql install,
    // pass-through hooks, reconciliation)
    val src = Files.createTempDirectory("graft-cli-e2e")
    val zos = new ZipOutputStream(Files.newOutputStream(src.resolve("animals.zip")))
    zos.putNextEntry(new ZipEntry("animals_1.csv"))
    zos.write("name,origin,height\nGrizzly,\"North America\",220\nGiraffe,Africa,600\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    Files.write(src.resolve("animals_2.csv"),
      "name,origin,height\nWallabie,Australia,180\n".getBytes("UTF-8"))
    val hook = Files.createTempFile("post", ".sql")
    Files.write(hook,
      // pass-through lane (LIKE clone) against the live server
      "CREATE TABLE import.animals_clone (LIKE import.animals_2 INCLUDING ALL);".getBytes("UTF-8"))

    val (sink, passThrough) = graft.cli.Main.wiring(None, Some(opts))
    val cfg = graft.pipeline.LoaderConfig(
      sources = Seq(src), combineTables = true, postLoad = Seq(hook))
    val result = new graft.pipeline.Loader(spark, cfg, sink, passThrough).load()

    assert(result.tables.keySet === Set("animals_1", "animals_2"))
    assert(Psql.query(opts, "SELECT count(*) FROM import.animals_1") === Seq("2"))
    assert(Psql.query(opts, "SELECT count(*) FROM import.animals_2") === Seq("1"))
    assert(Psql.query(opts, "SELECT count(*) FROM import.animals") === Seq("3"),
      "combined table must land in PG too")
    assert(Psql.query(opts,
      "SELECT origin FROM import.animals_1 WHERE name = 'Grizzly'")
      === Seq("North America"), "quoted CSV field must survive the COPY")
    // packaged functions.sql was installed into the live sink by the Loader
    assert(Psql.query(opts,
      "SELECT strip(E'\\nab\"c\\n') IS NOT DISTINCT FROM 'abc'") === Seq("t"))
    // the pass-through hook's clone exists server-side
    assert(Psql.query(opts,
      "SELECT count(*) FROM import.animals_clone") === Seq("0"))
    assert(!result.report.exists(_.fatal), "reconciliation must not be fatal")
  }

  live("mini-load reconciles: parquet row counts == live public.* counts") {
    val sf = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sf)), "testdata missing")
    Seq("nation", "region").foreach { t =>
      val df = spark.read.parquet(s"$sf/$t.parquet")
      PostgresSink.write(df, t, opts, SaveMode.Overwrite, numWriters = 2)
      val pgCount = Psql.query(opts, s"SELECT count(*) FROM $t").head.toLong
      assert(pgCount === df.count(), s"table $t")
    }
    // and the values survive, not just the counts: spot-check a join
    val joined = Psql.query(opts,
      """SELECT n.n_name FROM nation n JOIN region r
        |ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'EUROPE' ORDER BY n.n_name""".stripMargin)
    import spark.implicits._
    val expected = spark.read.parquet(s"$sf/nation.parquet")
      .join(spark.read.parquet(s"$sf/region.parquet"),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .filter(org.apache.spark.sql.functions.col("r_name") === "EUROPE")
      .select("n_name").as[String].collect().sorted.toSeq
    assert(joined === expected)
  }
}
