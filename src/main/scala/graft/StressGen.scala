package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's test tables for stress runs
  * (not part of the driver contract; the round-3 stress data was built
  * ad hoc and never committed — this makes the evidence reproducible):
  *
  *   sbt "runMain graft.StressGen /root/testdata/sf0.1 /tmp/sfstress/sf1 10"
  *
  * Each fact/document table is unioned K times with every key column
  * offset by copy × stride, so joins stay consistent within a copy and
  * key spaces never collide across copies. The bounded dimensions
  * (region 5, nation 25) are NOT replicated — at 100 TB you have more
  * orders, not more nations. `documents.text` and `embeddings.embedding`
  * are copied VERBATIM: content duplication grows K×, which is precisely
  * the recrawl shape the dedup-first operators claim to be flat against
  * (per-distinct-text work constant in K, doc-level expansions ∝ output).
  *
  * The optional `saltFrac` knob (0..1, default 0) probes the OPPOSITE
  * regime — the one where dedup-first degenerates because there is
  * nothing to collapse: that fraction of each replicated copy's documents
  * (copy 0 stays verbatim) gets a short unique suffix appended, making
  * the full text distinct while the shingle profile stays near-duplicate.
  * Selection is a pure function of doc_id (pmod of its hash), so salted
  * derivations are exactly reproducible:
  *
  *   sbt "runMain graft.StressGen /root/testdata/sf0.1 /tmp/sfstress/sf1salt 10 0.9"
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: StressGen <srcDir> <outDir> <K> [saltFrac]")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (key, v) => builder.config(key, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0), args(1), args(2).toInt,
      if (args.length == 4) args(3).toDouble else 0.0)
    finally spark.stop()
  }

  /** Session-agnostic body (spec-callable without owning the session). */
  def run(spark: SparkSession, src: String, out: String, k: Int,
      saltFrac: Double = 0.0): Unit = {
    require(saltFrac >= 0.0 && saltFrac <= 1.0, "saltFrac must be in [0, 1]")

    // key stride per table-key: a power of ten above the source max, so
    // offset keys are disjoint and still readable in failure output
    def strideOf(df: DataFrame, c: String): Long = {
      val mx = df.agg(max(col(c))).head().getAs[Number](0).longValue()
      var s = 1L
      while (s <= mx) s *= 10
      s
    }

    // one stride per KEY DOMAIN, taken from the table that owns the key —
    // a fact table's FK must shift by the DIMENSION's stride or the join
    // breaks when the two maxes straddle a power of ten
    val stride = Map(
      "custkey" -> strideOf(Tables.table(spark, src, "customer"), "c_custkey"),
      "suppkey" -> strideOf(Tables.table(spark, src, "supplier"), "s_suppkey"),
      "partkey" -> strideOf(Tables.table(spark, src, "part"), "p_partkey"),
      "orderkey" -> strideOf(Tables.table(spark, src, "orders"), "o_orderkey"),
      "event_id" -> strideOf(Tables.table(spark, src, "events"), "event_id"),
      "user_id" -> strideOf(Tables.table(spark, src, "events"), "user_id"),
      "doc_id" -> strideOf(Tables.table(spark, src, "documents"), "doc_id"),
      "vec_id" -> strideOf(Tables.table(spark, src, "embeddings"), "vec_id"))

    /** Union k copies, offsetting each (column → key-domain) by copy*stride. */
    def scaled(name: String, keys: Map[String, String]): DataFrame = {
      val d = Tables.table(spark, src, name)
      (0 until k).map { i =>
        keys.foldLeft(d) { case (acc, (c, dom)) =>
          acc.withColumn(c, col(c) + lit(i.toLong * stride(dom)))
        }
      }.reduce(_.unionByName(_))
    }

    // single FILE per table (not a directory) — the driver's testdata
    // layout, and what the DuckDB oracle's read_parquet expects. Small
    // row groups (4 MB) keep the single file SPLITTABLE: parquet scans
    // parallelize at row-group granularity, and a coalesce(1) with the
    // default 128 MB block size would serialize every downstream scan
    // into one task (measured: q_parse_timestamp 10× slower at sf2).
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/.$name.tmp"
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", 4L * 1024 * 1024)
        .parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      val fs = tmpPath.getFileSystem(conf)
      val part = fs.listStatus(tmpPath)
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      fs.delete(dest, true)
      if (!fs.rename(part, dest))
        throw new java.io.IOException(s"rename $part -> $dest failed")
      fs.delete(tmpPath, true)
      println(s"[stressgen] $name: ${spark.read.parquet(dest.toString).count()} rows")
    }

    // bounded dimensions: verbatim
    Seq("region", "nation").foreach(t => write(Tables.table(spark, src, t), t))
    write(scaled("customer", Map("c_custkey" -> "custkey")), "customer")
    write(scaled("supplier", Map("s_suppkey" -> "suppkey")), "supplier")
    write(scaled("part", Map("p_partkey" -> "partkey")), "part")
    write(scaled("orders",
      Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey")), "orders")
    write(scaled("lineitem", Map("l_orderkey" -> "orderkey",
      "l_partkey" -> "partkey", "l_suppkey" -> "suppkey")), "lineitem")
    write(scaled("events",
      Map("event_id" -> "event_id", "user_id" -> "user_id")), "events")
    // documents: replicate, then salt the requested fraction of each
    // NON-ZERO copy — deterministic per doc (hash-pmod selection), unique
    // per (copy, doc) so every salted text is globally distinct
    val docs = {
      val d = Tables.table(spark, src, "documents")
      (0 until k).map { i =>
        val shifted = d.withColumn("doc_id", col("doc_id") + lit(i.toLong * stride("doc_id")))
        if (i == 0 || saltFrac == 0.0) shifted
        else shifted.withColumn("text",
          when(pmod(xxhash64(col("doc_id")), lit(1000000L)) < lit((saltFrac * 1e6).toLong),
            concat(col("text"), lit(s" #salt$i-"), col("doc_id")))
            .otherwise(col("text")))
      }.reduce(_.unionByName(_))
    }
    write(docs, "documents")
    write(scaled("embeddings", Map("vec_id" -> "vec_id")), "embeddings")
  }
}
