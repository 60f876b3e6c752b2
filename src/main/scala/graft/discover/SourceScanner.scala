package graft.discover

import java.nio.file.{Files, Path, Paths}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Recursive source discovery + prefix grouping (SURVEY §2.1 S1/S3,
  * §2.2 P1). Behavior pinned to the reference:
  *
  *  - extension matching is case-sensitive (`mock_dir.ZIP` is NOT a zip —
  *    reference tests/test_unzip.py:39-44);
  *  - a source may be a directory (recursed) or a single file of the right
  *    extension (reference utils.py:20-26);
  *  - discovered files are deduped across overlapping source dirs;
  *  - `excludeRegex` drops CSVs whose *stem* matches (main.py:180-185);
  *  - grouping key is the slugified first-'_'-segment of the stem
  *    (main.py:186-194 via utils.py:84-88).
  *
  * Driver-side by design: listing file trees is control-plane work; the
  * data plane only ever sees the resulting path lists (which Spark then
  * reads with one distributed scan per group).
  */
object SourceScanner {

  def discover(sources: Seq[Path], extension: String): Seq[Path] = {
    val matched = sources.flatMap { src =>
      if (Files.isDirectory(src))
        Files.walk(src).iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith("." + extension))
          .toSeq
      else if (Files.isRegularFile(src) && src.getFileName.toString.endsWith("." + extension))
        Seq(src)
      else Seq.empty
    }
    matched.distinct.sortBy(_.toString)
  }

  def discoverZips(sources: Seq[Path]): Seq[Path] = discover(sources, "zip")

  def discoverCsvs(sources: Seq[Path], excludeRegex: Option[String] = None): Seq[Path] =
    applyExclude(discover(sources, "csv"), excludeRegex)

  private def applyExclude(all: Seq[Path], excludeRegex: Option[String]): Seq[Path] =
    excludeRegex match {
      case Some(re) =>
        val r: Regex = re.r
        all.filterNot(p => r.matches(Slug.rawStem(p)))
      case None => all
    }

  // ---- distributed lane ---------------------------------------------------

  /** Root count at or above which the spark-aware overloads fan discovery
    * out to executors instead of walking on the driver. */
  val DistributedThreshold = 64

  /** Distributed discovery for trees too large for a single-threaded
    * driver walk (the first 100 TB bottleneck: millions of small files
    * behind one `Files.walk`). Semantics are identical to [[discover]] —
    * same case-sensitive extension match, same dedup across overlapping
    * roots, same ordering — only the walk is parallel:
    *
    *  1. the driver expands source roots breadth-first, ONE readdir per
    *     directory per round, until there are at least `fanout` pending
    *     subtrees (or `maxDepth` rounds — a pathological narrow-deep tree
    *     must not pull the whole walk back onto the driver); matching
    *     files met during expansion are kept directly;
    *  2. the pending subtrees become an RDD and each executor task
    *     recursively walks its subtree, shipping back only (path, size)
    *     strings — never file contents or metadata objects.
    *
    * Local/NFS-style filesystems are walked with java.nio on the
    * executors (exactly the driver lane's semantics); an object-store
    * deployment would swap step 2's walker for the Hadoop `FileSystem`
    * recursive listing against the same work-unit split. */
  def discoverDistributed(
      spark: org.apache.spark.sql.SparkSession,
      sources: Seq[Path],
      extension: String,
      fanout: Int = 256,
      maxDepth: Int = 3): Seq[Path] = {
    val suffix = "." + extension
    val (dirs0, rest) = sources.partition(Files.isDirectory(_))
    var found = rest.collect {
      case p if Files.isRegularFile(p) && p.getFileName.toString.endsWith(suffix) =>
        p.toString
    }.toVector
    var frontier = dirs0.map(_.toString).toVector
    var depth = 0
    while (frontier.nonEmpty && frontier.size < fanout && depth < maxDepth) {
      val children = frontier.flatMap { d =>
        Files.list(Paths.get(d)).iterator().asScala.toVector
      }
      found ++= children.collect {
        case p if Files.isRegularFile(p) && p.getFileName.toString.endsWith(suffix) =>
          p.toString
      }
      frontier = children.filter(Files.isDirectory(_)).map(_.toString)
      depth += 1
    }
    val walked: Seq[String] =
      if (frontier.isEmpty) Seq.empty
      else {
        val slices = math.min(frontier.size,
          spark.sparkContext.defaultParallelism * 4)
        spark.sparkContext
          .parallelize(frontier, slices)
          .flatMap { d =>
            // executor-side recursive walk; only (path, size) crosses the wire
            Files.walk(Paths.get(d)).iterator().asScala
              .filter(p => Files.isRegularFile(p) &&
                p.getFileName.toString.endsWith(suffix))
              .map(p => (p.toString, Files.size(p)))
              .toVector
          }
          .collect()
          .map(_._1)
          .toSeq
      }
    (found ++ walked).distinct.sorted.map(Paths.get(_))
  }

  /** CSV discovery that picks the lane by root count: at
    * [[DistributedThreshold]]+ roots the walk fans out to executors. */
  def discoverCsvs(
      spark: org.apache.spark.sql.SparkSession,
      sources: Seq[Path],
      excludeRegex: Option[String]): Seq[Path] = {
    val all =
      if (sources.size >= DistributedThreshold)
        discoverDistributed(spark, sources, "csv")
      else discover(sources, "csv")
    applyExclude(all, excludeRegex)
  }

  /** Group CSVs into logical tables by slugified prefix; insertion-ordered
    * so combine order is deterministic (reference sorts work items,
    * main.py:168). */
  def groupByTable(csvs: Seq[Path]): ListMap[String, Seq[Path]] = {
    val grouped = csvs.groupBy(Slug.tableNameForPath)
    ListMap(grouped.toSeq.sortBy(_._1): _*)
  }

  def apply(sources: Seq[String]): Seq[Path] = sources.map(Paths.get(_))
}
