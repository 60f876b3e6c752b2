package graft.operators

/** The SECOND PROCESS of the cross-process lease spec
  * ([[ForkedLeaseSpec]]): a minimal main — no SparkSession, just the
  * bare Hadoop configuration [[StoreLock.withLockConf]] needs — forked
  * as a real JVM so refusal, heartbeat, and dead-pid takeover are
  * exercised through an actual process boundary (the in-JVM lease
  * plants of [[StoreLeaseSpec]] cannot reproduce the hard-link create,
  * the pid-namespace scope, or a kernel-real dead pid).
  *
  * Usage: `LeaseProbeMain <storeDir> <mode> <syncDir> <expiryMs>`
  *
  *  - `hold`:  acquire the store's lock+lease, touch `<syncDir>/acquired`,
  *             hold until `<syncDir>/release` appears, exit 0.
  *  - `crash`: acquire, touch `<syncDir>/acquired`, then `Runtime.halt`
  *             mid-hold — the lease file survives as crash residue with
  *             this (now dead) pid as its owner.
  *
  * All synchronization is via marker files — the spec polls them with a
  * deadline; no sleeps-as-logic. */
object LeaseProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(storeDir, mode, syncDir, expiryMs) = args
    val conf = new org.apache.hadoop.conf.Configuration()
    def touch(name: String): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(syncDir, name),
        s"${ProcessHandle.current().pid()}\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    StoreLock.withLockConf(conf, storeDir, s"probe-$mode",
      leaseExpiryMs = expiryMs.toLong) {
      touch("acquired")
      mode match {
        case "crash" =>
          // a real crash: no release, no heartbeat shutdown, the lease
          // file stays behind owned by a pid the kernel knows is dead
          Runtime.getRuntime.halt(42)
        case "hold" =>
          val release = java.nio.file.Paths.get(syncDir, "release")
          val deadline = System.nanoTime() + 120L * 1000000000L
          while (!java.nio.file.Files.exists(release) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        case other =>
          System.err.println(s"unknown mode $other"); sys.exit(2)
      }
    }
    sys.exit(0)
  }
}
