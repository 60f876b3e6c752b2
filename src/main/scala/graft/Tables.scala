package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata access (TESTDATA.md): one parquet file per table under a
  * scale-factor directory. Columns are pruned and filters pushed down by
  * the parquet datasource, so always read via this helper and let Catalyst
  * prune — never pre-collect.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects; we read it as a long (nanosAsLong, set in
  * session conf) and truncate to microseconds — the same truncation DuckDB
  * applies when loading nanos into its micro-precision TIMESTAMP.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session options every graft entry point must set. */
  val RequiredConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integer div (not /) — nano epochs exceed double's 2^53 mantissa
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case None => df
    }
  }
}
