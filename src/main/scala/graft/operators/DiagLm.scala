package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** Per-stage task accounting for any lane list (DIAG_LANES env, comma-
  * separated): 2 warm-up serves, then one timed serve with a listener
  * summing per-stage task time — the §1 empirical-loop tool that found
  * the AQE byte-floor serialization (a 1.49 s single-task stage with 31
  * idle cores). Diagnostic main, not part of any query path. */
object DiagLm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val lanes = sys.env.getOrElse("DIAG_LANES", "q_median_price").split(",")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
    graft.Tables.RequiredConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageInfo = TrieMap.empty[Int, (Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val (n, s, m) = stageInfo.getOrElse(t.stageId, (0, 0L, 0L))
        val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
        stageInfo.update(t.stageId, (n + 1, s + d, math.max(m, d)))
        ()
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (lane <- lanes) {
      (1 to 2).foreach { _ =>
        noop(graft.QueryRegistry.byName(lane).run(spark, sfDir))
        spark.sharedState.cacheManager.clearCache()
      }
      stageInfo.clear()
      val t0 = System.nanoTime()
      noop(graft.QueryRegistry.byName(lane).run(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val st = stageInfo.toSeq.sortBy(_._1)
      val nstages = st.size; val ntasks = st.map(_._2._1).sum
      val sum = st.map(_._2._2).sum / 1000.0
      println(f"[diag] $lane: $dt%.3f s | stages=$nstages tasks=$ntasks taskSum=$sum%.1f s")
      st.filter(_._2._3 >= 150).foreach { case (id, (n, s, m)) =>
        println(f"[diag]   hot stage $id%4d: tasks=$n%3d sum=${s / 1000.0}%6.2f s max=${m / 1000.0}%6.2f s")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
