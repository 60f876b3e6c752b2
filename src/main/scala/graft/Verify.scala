package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_ONLY=q_a,q_b — restrict the dump for fast local
    // iteration; the driver never sets it, so the gate always runs all.
    // GRAFT_VERIFY_DIFF is the same restriction driven by
    // scripts/verify_diff.sh, which then runs the bundled checker in
    // --diff mode so BOTH engines' sorted typed rows land in
    // <outDir>/_diff — one command turns a driver-red row into a
    // cell-level diff instead of a boolean.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .orElse(sys.env.get("GRAFT_VERIFY_DIFF")).map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // lane notes beside the dump: the permanent no-oracle lanes are
    // certified by their oracle-green _portable twins (one shared map,
    // QueryRegistry.certifiedByTwin) — so a correctness reader sees
    // "certified by twin", not an unexplained null row. `_env` stamps the
    // producing environment (round-14 lesson: a gate disagreement between
    // two environments is unadjudicable when neither record says which
    // JVM/Spark built the dump — the comparator's own stamp lives in the
    // checker's ENV line / the driver's record).
    val envNote = s"{${q("jvm")}: ${q(System.getProperty("java.version"))}, " +
      s"${q("spark")}: ${q(org.apache.spark.SPARK_VERSION)}, " +
      s"${q("os")}: ${q(System.getProperty("os.name") + " " +
        System.getProperty("os.version"))}, " +
      s"${q("scala")}: ${q(scala.util.Properties.versionNumberString)}}"
    Files.writeString(Paths.get(s"$outDir/lane_notes.json"),
      (QueryRegistry.certifiedByTwin.map { case (k, v) =>
        s"${q(k)}: {${q("status")}: ${q("certified_by_twin")}, " +
          s"${q("twin")}: ${q(v)}}"
      } ++ Seq(s"${q("_env")}: $envNote")).mkString("{", ",", "}"))
    spark.stop()
  }
}
