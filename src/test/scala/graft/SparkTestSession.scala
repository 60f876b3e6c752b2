package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are expensive;
  * ScalaTest suites reuse this). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // static conf — must be set when the context is built; exercised by
      // GraftExtensionsSpec via newSession() (fresh function registry)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", s"/tmp/graft-warehouse-${java.util.UUID.randomUUID()}")
      .config("spark.ui.enabled", "false")
    Tables.RequiredConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
