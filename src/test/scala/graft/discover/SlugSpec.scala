package graft.discover

import java.nio.file.Paths
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's slug/table-name behavior
  * (tests/test_load.py:38-71, utils.py:69-88). */
class SlugSpec extends AnyFunSuite {

  test("table name = slugified first segment of stem") {
    assert(Slug.tableNameForPath(Paths.get("/Train Data/2019 - 01/running_jan19.csv")) === "running")
    assert(Slug.tableNameForPath(Paths.get("/Train Data/2019 - 01/train_jan19.csv")) === "train")
    assert(Slug.tableNameForPath(Paths.get("/Train Data/running/timetable_feb19.csv")) === "timetable")
    assert(Slug.tableNameForPath(Paths.get("/x/timetables_jan19.csv")) === "timetables")
    // '.' in stem becomes '_' → first segment
    assert(Slug.tableNameForPath(Paths.get("/Train Data/running/example.test.csv")) === "example")
  }

  test("german transliteration and unicode folding") {
    assert(Slug.toFilename("straße") === "strasse")
    assert(Slug.toFilename("über") === "ueber")
    assert(Slug.toFilename("björn") === "bjoern")
    assert(Slug.toFilename("hä") === "hae")
    assert(Slug.toFilename("café") === "cafe") // NFKD + ascii-ignore
  }

  test("whitespace/dash collapse and punctuation strip") {
    assert(Slug.toFilename("a - b") === "a_b")
    assert(Slug.toFilename("a.b.c") === "a_b_c")
    assert(Slug.toFilename("  x  ") === "x")
    assert(Slug.toFilename("a!@#b") === "ab")
  }

  test("slug output is always word characters and underscores (property)") {
    val prop = Prop.forAll(Gen.asciiStr, Gen.listOf(Gen.oneOf("ä", "ö", "ü", "ß", "é", " ", "-", "."))) {
      (s: String, extras: List[String]) =>
        Slug.toFilename(s + extras.mkString).matches("[\\w]*")
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
