package graft.cli

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.pipeline.{Loader, LoaderConfig}

/** CLI entry with the reference's flag surface (README.md:107-126,
  * cli.py:7-128):
  *
  *   graft.cli.Main <sources...> [--all] [--disable-unzip]
  *     [--disable-import] [--combine-tables] [--combine-by-name] [--disable-check]
  *     [--exclude-regex RE] [--pre-load PATH...] [--post-load PATH...]
  *     [--log-level LEVEL] [--out-dir DIR]
  *
  * The `--db-*` options of the reference select the Postgres sink
  * (CopyManager COPY with the driver jar, psql-subprocess COPY without —
  * see graft.sink.PostgresSink; exercised against a live server in
  * graft.sink.LivePgSpec); `--out-dir` writes parquet per table instead,
  * the same pipeline shape with a columnar target.
  */
object Main {

  /** Sink + hook pass-through wiring — factored from [[main]] so the
    * live-PG e2e drives the exact CLI construction. Precedence mirrors
    * the reference: an explicit out-dir wins, else the PG sink, else
    * temp-view-only (dry run). */
  def wiring(
      outDir: Option[String],
      db: Option[graft.sink.PostgresSink.DbOptions])
      : ((String, org.apache.spark.sql.DataFrame) => Unit, Option[String => Unit]) = {
    val sink: (String, org.apache.spark.sql.DataFrame) => Unit =
      if (outDir.isDefined) (name, df) =>
        df.write.mode("overwrite").parquet(s"${outDir.get}/$name.parquet")
      else db match {
        case Some(d) => (name, df) => graft.sink.PostgresSink.write(df, s"import.$name", d)
        case None    => (_, _) => ()
      }
    (sink, db.map(graft.sink.PostgresSink.executor))
  }

  def parse(args: Seq[String]): (LoaderConfig, Option[String], String, Map[String, String]) = {
    var cfg = LoaderConfig(sources = Seq.empty)
    var outDir: Option[String] = None
    var logLevel = "WARN"
    var dbOpts = Map.empty[String, String]
    var i = 0
    val sources = scala.collection.mutable.ListBuffer.empty[String]
    def valueOf(flag: String): String = {
      i += 1
      require(i < args.length, s"$flag requires a value")
      args(i)
    }
    def valuesOf(flag: String): Seq[String] = {
      val vs = scala.collection.mutable.ListBuffer.empty[String]
      while (i + 1 < args.length && !args(i + 1).startsWith("--")) { i += 1; vs += args(i) }
      require(vs.nonEmpty, s"$flag requires at least one value")
      vs.toSeq
    }
    while (i < args.length) {
      args(i) match {
        case "--all"             => cfg = cfg.copy(all = true)
        case "--disable-unzip"   => cfg = cfg.copy(disableUnzip = true)
        case "--disable-import"  => cfg = cfg.copy(disableImport = true)
        case "--combine-tables"  => cfg = cfg.copy(combineTables = true)
        // extension beyond the reference flag surface: by-name combine for
        // ragged sibling schemas (implies --combine-tables)
        case "--combine-by-name" => cfg = cfg.copy(combineTables = true, combineByName = true)
        case "--disable-check"   => cfg = cfg.copy(disableCheck = true)
        case "--exclude-regex"   => cfg = cfg.copy(excludeRegex = Some(valueOf("--exclude-regex")))
        case "--max-parallel"    => cfg = cfg.copy(maxParallel = valueOf("--max-parallel").toInt)
        case "--pre-load"        => cfg = cfg.copy(preLoad = valuesOf("--pre-load").map(Paths.get(_)))
        case "--post-load"       => cfg = cfg.copy(postLoad = valuesOf("--post-load").map(Paths.get(_)))
        case "--log-level"       => logLevel = valueOf("--log-level").toUpperCase
        case "--out-dir"         => outDir = Some(valueOf("--out-dir"))
        case s if s.startsWith("--db-") =>
          // reference db option surface (cli.py:79-127): --db-host,
          // --db-port, --db-name, --db-user, --db-password; env DB_*
          // fallback is applied at resolve time (PostgresSink.DbOptions)
          dbOpts += (s.stripPrefix("--") -> valueOf(s))
        case s if s.startsWith("--") => throw new IllegalArgumentException(s"unknown flag $s")
        case s                   => sources += s
      }
      i += 1
    }
    require(sources.nonEmpty, "at least one source dir or file required")
    sources.foreach(s => require(Files.exists(Paths.get(s)), s"$s is not a directory or existing file"))
    (cfg.copy(sources = sources.map(Paths.get(_)).toSeq), outDir, logLevel, dbOpts)
  }

  def main(args: Array[String]): Unit = {
    val (cfg, outDir, logLevel, dbOpts) = parse(args.toIndexedSeq)
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-loader")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    // O2/O7 progress bridge + O4 signal-driven graceful shutdown
    spark.sparkContext.addSparkListener(new ProgressReporter())
    GracefulShutdown.install(spark)
    try {
      val resolvedDb =
        if (dbOpts.nonEmpty) Some(graft.sink.PostgresSink.DbOptions.resolve(dbOpts)) else None
      // with a PG sink configured, pass-through hook statements and the
      // packaged functions.sql install run against it
      val (sink, passThrough) = wiring(outDir, resolvedDb)
      val result = new Loader(spark, cfg, sink, passThrough).load()
      result.report.foreach { r =>
        println(r.render)
        if (r.fatal) { spark.stop(); sys.exit(1) }
      }
    } finally spark.stop()
  }
}
