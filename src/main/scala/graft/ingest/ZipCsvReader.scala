package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distributed zip→CSV ingestion (SURVEY §2.1 S1 executor-side variant):
  * instead of the driver-side unzip pre-stage, read the archives as
  * `binaryFile` rows and decompress INSIDE executors — the path for bulk
  * zip corpora where archives are many/large and driver-side extraction
  * would serialize the whole stage.
  *
  * Pipeline: binaryFile scan (one partition per archive) → per-archive
  * entry decompression and line split in `flatMap` (skipping each entry's
  * header line) → `spark.read.csv` over the line Dataset with the header-
  * derived all-text schema (pgfutter semantics preserved).
  *
  * Caveat vs splittable formats: one zip = one task (zip entries are not
  * block-splittable), so parallelism = number of archives. Fine for
  * many-archive corpora; repack to parquet for anything else.
  */
object ZipCsvReader {

  /** Read every `.csv` entry of every zip under `pattern` into one
    * all-text DataFrame. The schema comes from the first entry's header
    * (LIKE-INCLUDING-ALL authority, SURVEY §1.2); sibling entries must
    * align positionally. */
  def read(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    val bins = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(pattern)
      .select("content").as[Array[Byte]]
    val header = firstHeader(spark, bins)
    val columns = header.split(",", -1).map(CsvTableReader.sanitize)
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    val lines: Dataset[String] = bins.flatMap(bytes => entryLines(bytes))
    spark.read
      .option("header", "false")
      .option("inferSchema", "false")
      .schema(schema)
      .csv(lines)
  }

  /** All data lines (header of each entry skipped) of all csv entries. */
  private[ingest] def entryLines(zipBytes: Array[Byte]): Iterator[String] = {
    val entries = scala.collection.mutable.ListBuffer.empty[String]
    val in = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var e = in.getNextEntry
      while (e != null) {
        if (!e.isDirectory && e.getName.endsWith(".csv")) {
          val text = new String(in.readAllBytes(), "UTF-8")
          entries ++= text.split("\r?\n", -1).drop(1).filter(_.nonEmpty)
        }
        in.closeEntry()
        e = in.getNextEntry
      }
    } finally in.close()
    entries.iterator
  }

  /** Header row of the first csv entry of the first archive (driver-side
    * metadata peek: one small task, not a full read). */
  private def firstHeader(spark: SparkSession, bins: Dataset[Array[Byte]]): String = {
    import spark.implicits._
    val headers = bins.flatMap { bytes =>
      val in = new ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        var e = in.getNextEntry
        var out: Option[String] = None
        while (e != null && out.isEmpty) {
          if (!e.isDirectory && e.getName.endsWith(".csv")) {
            val text = new String(in.readAllBytes(), "UTF-8")
            out = text.split("\r?\n", 2).headOption
          }
          in.closeEntry()
          e = if (out.isEmpty) in.getNextEntry else null
        }
        out.iterator
      } finally in.close()
    }
    headers.head()
  }
}
