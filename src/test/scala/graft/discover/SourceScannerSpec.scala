package graft.discover

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Discovery/grouping behavior pinned to reference tests
  * (tests/test_load.py:73-120, tests/test_unzip.py:33-50): recursive,
  * case-sensitive extensions, decoys ignored, sample files excludable. */
class SourceScannerSpec extends AnyFunSuite {

  private def mkTree(files: Seq[String]): Path = {
    val root = Files.createTempDirectory("scanner")
    files.foreach { f =>
      val p = root.resolve(f)
      Files.createDirectories(p.getParent)
      Files.write(p, Array.empty[Byte])
    }
    root
  }

  test("recursive csv discovery with decoys and sample exclusion") {
    val root = mkTree(Seq(
      "test/import/2019 - 01/running_jan19.csv",
      "test/import/2019 - 01/timetables_jan19.csv",
      "test/import/2019 - 01/train_jan19.csv",
      "test/import/2019 - 01/running_jan10_sample.csv",
      "test/import/2019 - 02/running_feb19.csv",
      "test/import/2019 - 02/timetables_feb19.csv",
      "test/import/2019 - 02/train_feb19.csv",
      "test/import/2019 - 02/timetables_jan19_sample.csv",
      "test/import/mock_dir.ZIP",
      "test/import/zip",
      "test/import/a.b",
      "test/import/mock_dir.x"))
    val found = SourceScanner.discoverCsvs(Seq(root), Some("^.*sample.*$"))
    assert(found.size === 6)
    assert(found.forall(_.toString.endsWith(".csv")))
    assert(!found.exists(_.toString.contains("sample")))

    val groups = SourceScanner.groupByTable(found)
    assert(groups.keySet === Set("running", "timetables", "train"))
    assert(groups("running").size === 2)
  }

  test("zip discovery is case-sensitive on extension") {
    val root = mkTree(Seq("a.b.zip", "x_y_z.zip", "mock_dir.ZIP", "zip"))
    val zips = SourceScanner.discoverZips(Seq(root))
    assert(zips.map(_.getFileName.toString).toSet === Set("a.b.zip", "x_y_z.zip"))
  }

  test("single-file source of the right extension passes through") {
    val root = mkTree(Seq("solo.csv"))
    val f = root.resolve("solo.csv")
    assert(SourceScanner.discoverCsvs(Seq(f)) === Seq(f))
    assert(SourceScanner.discoverZips(Seq(f)) === Seq.empty)
  }

  test("duplicate sources dedupe discovered files") {
    val root = mkTree(Seq("d/a.csv"))
    val found = SourceScanner.discoverCsvs(Seq(root, root.resolve("d")))
    assert(found.size === 1)
  }
}
