package graft.ingest

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-on-read CSV ingestion (SURVEY §2.1 S4) with pgfutter semantics
  * (reference README.md:51-53, 91-92):
  *
  *  - schema from the header row, every column `StringType`
  *    (`inferSchema=false` — typed views are a post-load concern, P3);
  *  - column names sanitized the way pgfutter derives Postgres identifiers
  *    (lowercase, non-word → '_');
  *  - encoding detected from a driver-side sample (reference uses chardet,
  *    utils.py:13-15) — BOM sniff + UTF-8 validity heuristic here, since
  *    the container has no chardet equivalent.
  *
  * The read itself is one distributed, splittable `FileSourceScanExec` per
  * table group — Spark parallelizes by HDFS-style splits, so a single huge
  * CSV still fans out across executors.
  */
object CsvTableReader {

  def read(spark: SparkSession, files: Seq[Path]): DataFrame = {
    require(files.nonEmpty, "no csv files for table")
    val encoding = detectEncoding(files.head)
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("encoding", encoding)
      // pgfutter/pg COPY semantics: empty field -> NULL is a post-load
      // concern (strip()); keep raw text here
      .option("nullValue", null: String)
      .csv(files.map(_.toString): _*)
    df.toDF(df.columns.map(sanitize).toIndexedSeq: _*)
  }

  /** pgfutter-style identifier sanitization: lowercase, spaces and
    * non-word chars to '_'. */
  def sanitize(name: String): String =
    name.trim.toLowerCase.replaceAll("[^\\w]", "_")

  /** Minimal encoding sniff: UTF-8/UTF-16 BOMs, else assume UTF-8 (valid
    * for the reference corpus; ISO-8859-1 fallback if the sample doesn't
    * decode). */
  def detectEncoding(file: Path): String = {
    val sample = {
      val in = Files.newInputStream(file)
      try { val buf = new Array[Byte](8192); val n = in.read(buf); buf.take(math.max(n, 0)) }
      finally in.close()
    }
    if (sample.length >= 3 && sample(0) == 0xEF.toByte && sample(1) == 0xBB.toByte && sample(2) == 0xBF.toByte) "UTF-8"
    else if (sample.length >= 2 && sample(0) == 0xFF.toByte && sample(1) == 0xFE.toByte) "UTF-16LE"
    else if (sample.length >= 2 && sample(0) == 0xFE.toByte && sample(1) == 0xFF.toByte) "UTF-16BE"
    else {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      try { dec.decode(java.nio.ByteBuffer.wrap(sample)); "UTF-8" }
      catch { case _: java.nio.charset.CharacterCodingException => "ISO-8859-1" }
    }
  }
}
