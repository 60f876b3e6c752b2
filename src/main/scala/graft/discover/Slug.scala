package graft.discover

import java.nio.file.Path
import java.text.Normalizer

/** Filename slugification and table-name derivation (SURVEY §1.2, F8).
  *
  * Reference behavior: /root/reference/postgresimporter/utils.py:69-88 —
  * German transliteration (ß→ss, ä→ae, ö→oe, ü→ue), '.'→'_', NFKD
  * normalize + ASCII-ignore, strip non-word chars, collapse [-\s]+ to '_',
  * then the *combined* table name is segment 0 of the '_'-split stem.
  * Edge cases pinned by reference tests tests/test_load.py:44-71.
  */
object Slug {

  def toFilename(title: String): String = {
    val transliterated = title
      .replace("ß", "ss") // ß
      .replace("ä", "ae") // ä
      .replace("ö", "oe") // ö
      .replace("ü", "ue") // ü
      .replace(".", "_")
    // NFKD + drop non-ASCII (python's encode('ascii','ignore'))
    val ascii = Normalizer.normalize(transliterated, Normalizer.Form.NFKD)
      .filter(_ < 128)
    // python: re.sub(r"[^\w\s-]", "", s).strip() then re.sub(r"[-\s]+", "_")
    val cleaned = ascii.replaceAll("[^\\w\\s-]", "").trim
    cleaned.replaceAll("[-\\s]+", "_")
  }

  /** Combined-table name for a file: slugified stem, first '_' segment.
    * `running_jan19.csv` → `running`; `example.test.csv` → `example`. */
  def tableNameForPath(path: Path): String = {
    val name = path.getFileName.toString
    val stem = name.lastIndexOf('.') match {
      case -1 => name
      case i  => name.substring(0, i)
    }
    toFilename(stem).split("_", -1).head
  }

  /** Raw stem — individual import tables use the un-slugified stem
    * (reference main.py:509 asymmetry, SURVEY §1.2). */
  def rawStem(path: Path): String = {
    val name = path.getFileName.toString
    name.lastIndexOf('.') match {
      case -1 => name
      case i  => name.substring(0, i)
    }
  }
}
