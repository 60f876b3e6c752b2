package graft.operators

import org.apache.spark.sql.SparkSession

/** Root directory for every persisted derived artifact — the 15 index
  * families' stores plus the votes/curated serving artifacts. Until
  * round 14 this was pinned to driver-local `java.io.tmpdir`, which
  * blocked the natural fleet topology the writer lease exists for: two
  * lease-safe drivers SHARING warm stores on shared storage (each driver
  * re-materialized everything, and `java.io.File.lastModified` on an
  * `hdfs://` string silently returns 0 — staleness detection disabled).
  *
  * Resolution order (first set wins):
  *  1. Spark conf `spark.graft.store.root` on the active session — the
  *     per-job knob (`spark.conf.set` works at runtime);
  *  2. system property `graft.store.root` — the per-JVM knob;
  *  3. env `GRAFT_STORE_ROOT` — the per-deployment knob;
  *  4. `java.io.tmpdir` — unchanged default (single-driver local mode).
  *
  * Any Hadoop-FS-resolvable root works (`file:`, `hdfs:`, object
  * stores): store paths built here flow into `spark.read.parquet`, the
  * writer lock+lease (already Hadoop-qualified), and the staleness
  * detectors (Hadoop-FS mtimes since round 14 —
  * [[CurationFunnel]]). */
object StoreRoot {

  val ConfKey = "spark.graft.store.root"
  val PropKey = "graft.store.root"
  val EnvKey = "GRAFT_STORE_ROOT"

  def root: String =
    SparkSession.getActiveSession.flatMap(_.conf.getOption(ConfKey))
      .orElse(sys.props.get(PropKey))
      .orElse(sys.env.get(EnvKey))
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** `<root>/<name>` — the one path-joining rule every family shares. */
  def dir(name: String): String = s"${root.stripSuffix("/")}/$name"

  /** Existence through the path's OWN filesystem — the `ensure*`
    * memo check (`is the store already materialized?`) must resolve on
    * non-local roots too; `java.nio.file.Files.exists` on an `hdfs://`
    * string is silently false and would re-build the store per call. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
