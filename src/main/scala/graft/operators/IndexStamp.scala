package graft.operators

/** Shared cache-directory keying for the persisted index/model families
  * ([[IncrementalDedup]], [[ClusterIndex]], [[AnnIndex]], [[LmIndex]],
  * [[IvfIndex]]).
  *
  * Each family memoizes its on-disk index under a directory keyed by the
  * corpus identity (source path + parquet size/mtime + layout version).
  * That key MUST not collide across identities: a collision silently
  * serves a stale index for a different corpus — wrong results with no
  * error, the worst failure mode. 32-bit `String.hashCode` (the previous
  * scheme) makes that plausible at ~77k identities (birthday bound); a
  * 64-bit digest pushes it past 5 billion. SHA-256-truncated-to-64-bits
  * keeps the key stdlib-only and uniformly distributed regardless of how
  * adversarially similar two identity strings are.
  */
object IndexStamp {

  /** 16-hex-char directory key from an identity string. */
  def dirKey(identity: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(identity.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Standard identity string: source dir + size/mtime stamp of the
    * driving parquet + a per-family layout version tag. */
  def identity(dir: String, parquet: String, version: String): String = {
    val src = java.nio.file.Paths.get(s"$dir/$parquet")
    val stamp =
      if (java.nio.file.Files.exists(src))
        s"${java.nio.file.Files.size(src)}-${java.nio.file.Files.getLastModifiedTime(src).toMillis}"
      else "missing"
    s"$dir|$stamp|$version"
  }
}
