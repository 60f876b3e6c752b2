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

  def discoverCsvs(sources: Seq[Path], excludeRegex: Option[String] = None): Seq[Path] = {
    val all = discover(sources, "csv")
    excludeRegex match {
      case Some(re) =>
        val r: Regex = re.r
        all.filterNot(p => r.matches(Slug.rawStem(p)))
      case None => all
    }
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
