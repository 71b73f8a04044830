package graft.sources

/**
 * Per-directory writer mutex shared by the repo's mutable-state
 * publishers ([[ChunkIndex]] appends, [[Bucketed]] appends and
 * compacts): a same-JVM monitor (interned on the canonical path)
 * wrapping an advisory cross-process file lock.
 *
 * The monitor must wrap the file lock — `FileChannel.lock` throws
 * `OverlappingFileLockException` rather than queueing when the SAME
 * JVM already holds the region, so same-JVM callers serialize on the
 * monitor first and only one thread per JVM ever contends for the OS
 * lock. Cross-process writers on a shared POSIX filesystem serialize
 * on the advisory lock; object stores need an external coordinator
 * (or a real table format) — the documented boundary both call sites
 * carry.
 */
private[sources] object PathLock {

  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withLock[T](dir: String, lockFile: String)(body: => T): T = {
    val canon = new java.io.File(dir).getCanonicalPath
    val monitor = monitors.computeIfAbsent(canon, _ => new Object)
    monitor.synchronized {
      new java.io.File(dir).mkdirs()
      val ch = java.nio.channels.FileChannel.open(
        new java.io.File(dir, lockFile).toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until the other process commits
        try body finally lock.release()
      } finally ch.close()
    }
  }
}
