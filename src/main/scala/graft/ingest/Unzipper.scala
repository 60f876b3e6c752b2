package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ListBuffer

/** Zip extraction pre-stage (SURVEY §2.1 S2). Mirrors the reference's
  * `unzip -o src -d dest` semantics (main.py:474-489): one destination
  * directory per archive named by the stem, overwrite entries, and skip
  * archives whose destination already exists unless `all` is set
  * (main.py:153-168 idempotency).
  *
  * Runs driver-side for a handful of archives; for bulk zip corpora the
  * same `extract` is safe to call from `mapPartitions` over archive paths
  * (pure function of (zip, destRoot)).
  */
object Unzipper {

  final case class Result(archive: Path, dest: Path, entries: Int, skipped: Boolean)

  def unzipAll(zips: Seq[Path], all: Boolean = false): Seq[Result] =
    zips.sortBy(_.toString).map(unzip(_, all))

  /** Extract one archive next to itself, idempotent unless `all`. */
  def unzip(z: Path, all: Boolean = false): Result = {
    val dest = z.getParent.resolve(stem(z))
    if (Files.isDirectory(dest) && !all) Result(z, dest, 0, skipped = true)
    else extract(z, dest)
  }

  def extract(zip: Path, dest: Path): Result = {
    Files.createDirectories(dest)
    val in = new ZipInputStream(Files.newInputStream(zip))
    val extracted = ListBuffer.empty[Path]
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        val target = dest.resolve(entry.getName).normalize()
        // zip-slip guard: entries must stay inside dest
        require(target.startsWith(dest), s"zip entry escapes dest: ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          if (target.getParent != null) Files.createDirectories(target.getParent)
          Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
          extracted += target
        }
        in.closeEntry()
        entry = in.getNextEntry
      }
    } finally in.close()
    Result(zip, dest, extracted.size, skipped = false)
  }

  private def stem(p: Path): String = {
    val n = p.getFileName.toString
    n.lastIndexOf('.') match { case -1 => n; case i => n.substring(0, i) }
  }
}
