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

  test("distributed discovery matches the driver lane exactly") {
    val spark = graft.SparkTestSession.spark
    // a tree wide AND deep enough to exercise every lane branch: files at
    // the root, files met during shallow expansion, subtrees walked
    // executor-side, decoys, case-sensitive extensions, overlapping roots
    val root = mkTree(
      Seq("top.csv", "decoy.ZIP", "noext") ++
        (0 until 12).flatMap(i => Seq(
          s"shard$i/running_p$i.csv",
          s"shard$i/deep/deeper/deepest/train_p$i.csv",
          s"shard$i/deep/timetables_p$i.csv",
          s"shard$i/deep/skip_me.CSV",
          s"shard$i/running_p${i}_sample.csv")))
    val sources = Seq(root, root.resolve("shard0")) // overlapping roots
    for (exclude <- Seq(None, Some("^.*sample.*$"))) {
      val driver = SourceScanner.discoverCsvs(sources, exclude)
      val dist = {
        val all = SourceScanner.discoverDistributed(
          spark, sources, "csv", fanout = 8, maxDepth = 2)
        exclude.fold(all)(re => all.filterNot(p => re.r.matches(Slug.rawStem(p))))
      }
      assert(dist === driver)
      // grouping parity (tests/test_load.py:73-120 semantics)
      assert(SourceScanner.groupByTable(dist) === SourceScanner.groupByTable(driver))
    }
    // lane auto-selection stays behind the existing API: both root counts
    // give identical results through the spark-aware overload
    assert(SourceScanner.discoverCsvs(spark, sources, None) ===
      SourceScanner.discoverCsvs(sources, None))
    val manyRoots = Seq.fill(SourceScanner.DistributedThreshold)(root)
    assert(SourceScanner.discoverCsvs(spark, manyRoots, None) ===
      SourceScanner.discoverCsvs(manyRoots, None))
  }

  test("distributed discovery handles degenerate inputs like the driver lane") {
    val spark = graft.SparkTestSession.spark
    val root = mkTree(Seq("only/one.csv"))
    // single file source, missing path, empty dir
    val empty = Files.createTempDirectory("scanner-empty")
    val srcs = Seq(root.resolve("only/one.csv"), root.resolve("missing"), empty)
    assert(SourceScanner.discoverDistributed(spark, srcs, "csv") ===
      SourceScanner.discover(srcs, "csv"))
    // frontier collapses entirely during shallow expansion (tiny tree,
    // huge fanout): nothing is shipped to executors, results still match
    assert(SourceScanner.discoverDistributed(spark, Seq(root), "csv", fanout = 1000) ===
      SourceScanner.discover(Seq(root), "csv"))
  }
}
