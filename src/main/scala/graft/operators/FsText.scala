package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Small UTF-8 sidecar IO, shared by every tiny control file the engine
  * reads and writes (lease owner/expiry lines, the votes `_watermark`,
  * the funnel `_certificate`). Before round 14 each caller hand-rolled
  * open/readAllBytes/close/IOException-to-None with slightly different
  * behavior (review r14 finding) — protocol-specific RETRY and PARSE
  * stay with the callers, the byte plumbing lives here once. */
private[graft] object FsText {

  /** Whole file as UTF-8; None on any IOException (absent, mid-create,
    * transport error — callers that must distinguish retry above). */
  def read(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Plain overwrite-create — for writes into staging dirs that a
    * surrounding atomic publish makes visible as a whole. */
  def write(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Staged-sibling + rename — for sidecars REPLACED in place next to
    * live data: a crash mid-write leaves the old file (or nothing),
    * never a half-written one. The brief delete-to-rename absent window
    * must read as "no record" on the caller's side. */
  def writeAtomic(fs: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, "." + p.getName + ".tmp")
    fs.delete(tmp, false)
    write(fs, tmp, content)
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"sidecar publish failed: $tmp -> $p")
  }
}
