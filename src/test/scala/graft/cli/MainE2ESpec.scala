package graft.cli

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** True binary end-to-end: spawns the packaged entry point as a separate
  * JVM (`java -cp <test classpath> graft.cli.Main ...`) over a temp source
  * tree with a zip, ragged sibling CSVs, pre/post hooks and an exclude
  * regex — asserting the rendered reconciliation report text, the exit
  * code, and the parquet sink output. This is the one test that would
  * catch a broken main(): arg wiring, session construction, report
  * printing, exit status (≙ reference tests/test_cli.py + main.py:263-300).
  */
class MainE2ESpec extends AnyFunSuite {

  private def writeZip(path: Path, entries: (String, String)*): Unit = {
    val out = new ZipOutputStream(Files.newOutputStream(path))
    try entries.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }

  private def fixtureTree(): Path = {
    val dir = Files.createTempDirectory("graft-e2e")
    // a zip that must be extracted before import (2 data rows)
    writeZip(dir.resolve("animals.zip"),
      "animals_1.csv" -> "name,origin,height\nGrizzly,\"North America\",220\nGiraffe,Africa,600\n")
    // a loose sibling (1 data row)
    Files.write(dir.resolve("animals_2.csv"),
      "name,origin,height\nWallabie,Australia,180\n".getBytes)
    // a RAGGED sibling: extra column, reordered — needs --combine-by-name
    Files.write(dir.resolve("animals_3.csv"),
      "origin,name,height,color\nAfrica,Zebra,140,striped\n".getBytes)
    // excluded by --exclude-regex
    Files.write(dir.resolve("animals_9_sample.csv"),
      "name,origin,height\nDecoy,Nowhere,1\n".getBytes)
    dir
  }

  private def hooks(dir: Path): (Path, Path) = {
    val pre = dir.resolve("pre.sql")
    Files.write(pre, "DROP TABLE IF EXISTS leftover;".getBytes)
    val post = dir.resolve("post.sql")
    Files.write(post,
      ("CREATE OR REPLACE TEMP VIEW public_animals AS " +
        "SELECT strip(name) AS name, CAST(height AS INT) AS height FROM animals;").getBytes)
    (pre, post)
  }

  /** Launch the real main in a fresh JVM with this (forked) test JVM's
    * classpath and module options; returns (exitCode, stdout+stderr). */
  private def runMain(args: Seq[String]): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments
    val moduleOpts = new scala.collection.mutable.ListBuffer[String]
    var i = 0
    while (i < jvmOpts.size()) {
      if (jvmOpts.get(i) == "--add-opens" && i + 1 < jvmOpts.size()) {
        moduleOpts += "--add-opens" += jvmOpts.get(i + 1); i += 1
      }
      i += 1
    }
    val cmd = Seq(javaBin) ++ moduleOpts ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.cli.Main") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_MASTER", "local[4]")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val output = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val exit = proc.waitFor()
    (exit, output)
  }

  test("packaged main: zip + ragged CSVs + hooks + exclude → report, exit 0") {
    val dir = fixtureTree()
    val (pre, post) = hooks(dir)
    val outDir = Files.createTempDirectory("graft-e2e-out")
    val (exit, out) = runMain(Seq(
      dir.toString,
      "--combine-by-name", "--exclude-regex", "^.*sample.*$",
      "--pre-load", pre.toString, "--post-load", post.toString,
      "--out-dir", outDir.toString,
      "--log-level", "ERROR"))
    assert(exit === 0, s"non-zero exit; output:\n$out")

    // rendered reconciliation report (main.py:263-300 table): 3 csv files
    // = 4 data rows + 3 headers = 7 csv lines vs 4 combined rows → delta 3
    val reportLines = out.split("\n").filter(_.contains("animals"))
    assert(reportLines.nonEmpty, s"no report row in output:\n$out")
    assert(out.matches("(?s).*table\\s+csv\\s+db\\s+delta.*"), s"no report header in:\n$out")
    assert(out.matches("(?s).*animals\\s+7\\s+4\\s+3.*"),
      s"unexpected animals report row in:\n$out")
    assert(out.matches("(?s).*TOTAL\\s+3.*"), s"unexpected TOTAL row in:\n$out")
    // the excluded sample file must not appear anywhere
    assert(!out.contains("sample"))

    // the parquet sink got per-file tables AND the by-name combined table
    val spark = graft.SparkTestSession.spark
    val combined = spark.read.parquet(s"$outDir/animals.parquet")
    assert(combined.columns.toSeq === Seq("name", "origin", "height", "color"))
    assert(combined.count() === 4)
    assert(combined.where("name = 'Zebra' AND color = 'striped'").count() === 1)
    assert(combined.where("color IS NULL").count() === 3) // NULL-padded
    assert(spark.read.parquet(s"$outDir/animals_1.parquet").count() === 2)
  }

  test("packaged main: bad flag exits non-zero") {
    val dir = fixtureTree()
    val (exit, out) = runMain(Seq(dir.toString, "--no-such-flag"))
    assert(exit !== 0)
    assert(out.contains("unknown flag"), s"expected unknown-flag error in:\n$out")
  }
}
