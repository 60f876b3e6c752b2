package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The streaming SemDeDup-at-ingest lane: arriving vectors compare
  * against ONLY their clusters' resident survivors in the persisted IVF
  * store; kept vectors fold in, dropped ones don't; decisions are
  * eager (as-of arrival) and replay-stable. */
class SemanticDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Tau = 0.95
  private val cents: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(1.0, 0.0, 0.0, 0.0),
    1L -> Seq(0.0, 1.0, 0.0, 0.0))

  private val a = (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f))      // resident, == c0
  private val b = (11L, Seq(0.9f, 0.1f, 0.0f, 0.0f))      // near-dup of a → dropped
  private val c = (12L, Seq(0.1f, 0.0f, 1.0f, 0.0f))      // isolated → kept
  private val d = (13L, Seq(0.0f, 0.0f, 0.95f, 0.05f))    // near-dup of c, worse rank → dropped
  private val e = (14L, Seq(0.09f, 0.0f, 0.99f, 0.0f))    // near-dup of c, BETTER rank → kept (eager)

  private def vdf(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("ingest-order semantic dedup: drops near-dups of survivors, keeps the rest") {
    val base = java.nio.file.Files.createTempDirectory("graft-semstream").toString
    val indexDir = s"$base/idx"
    val decisionsDir = s"$base/decisions"
    graft.operators.IvfIndex.buildIndex(spark, indexDir, cents, vdf(a))

    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Seq[Float])]
    val q = EmbedStream.semanticDedupStream(
      spark, input.toDF().toDF("vec_id", "embedding"), indexDir, decisionsDir, Tau)
    try {
      input.addData(b, c)
      q.processAllAvailable()
      input.addData(d, e, b) // b re-delivered: re-decided identically
      q.processAllAvailable()
    } finally q.stop()

    val decisions = spark.read.parquet(decisionsDir)
      .select(col("vec_id"), col("kept")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toList
    // exactly one DISTINCT decision per vector (replays re-decide equal)
    assert(decisions.map(_._1).distinct.size === decisions.size,
      s"conflicting decisions: $decisions")
    val dm = decisions.toMap
    assert(dm === Map(11L -> 0L, 12L -> 1L, 13L -> 0L, 14L -> 1L), dm.toString)

    // the store holds exactly the survivors (a from the build, c and e)
    val stored = spark.read.parquet(s"$indexDir/cells.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(stored === Set(10L, 12L, 14L))

    // replaying an already-kept vector adds no epoch and no decision row
    def epochs = new java.io.File(s"$indexDir/cells.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    val beforeEpochs = epochs
    val beforeDecisions = spark.read.parquet(decisionsDir).count()
    EmbedStream.processSemanticDedupBatch(
      spark, indexDir, decisionsDir, Tau, vdf(c))
    assert(epochs === beforeEpochs)
    assert(spark.read.parquet(decisionsDir).count() === beforeDecisions)
  }
}
