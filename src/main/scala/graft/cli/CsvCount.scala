package graft.cli

import java.nio.file.Paths
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.check.ReconciliationCheck
import graft.discover.SourceScanner

/** Standalone CSV row counter — reference entry point 3
  * (`python -m postgresimporter.csvcount <source>`, csvcount.py:53-62):
  * counts every discovered CSV and prints one JSON object
  * `{path: count, ...}`.
  *
  * Default mode counts records precisely (csv.reader parity — quoted
  * fields may span lines); `--fast` switches to the splittable
  * distributed line count (`wc -l` parity, the mode the pipeline's
  * reconciliation step uses).
  */
object CsvCount {
  def main(rawArgs: Array[String]): Unit = {
    val fast = rawArgs.contains("--fast")
    val args = rawArgs.filterNot(_ == "--fast")
    require(args.nonEmpty, "usage: CsvCount [--fast] <source dir or file>...")
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-csvcount")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val files = SourceScanner.discoverCsvs(args.toIndexedSeq.map(Paths.get(_)))
      val counts =
        if (fast) ReconciliationCheck.csvLineCounts(spark, files)
        else ReconciliationCheck.preciseCsvCounts(spark, files)
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      println(counts.toSeq.sortBy(_._1)
        .map { case (f, n) => s"${q(f)}: $n" }.mkString("{", ", ", "}"))
    } finally spark.stop()
  }
}
