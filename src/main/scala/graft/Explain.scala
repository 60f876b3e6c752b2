package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints the formatted physical plan of the named
  * queries (all headline queries if none given) so pushdown, broadcast,
  * and codegen coverage can be reviewed per PERF.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else QueryRegistry.all.filter(_.headline).map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryRegistry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
