package graft

import java.nio.file.{Files, Path}

/** Temp-dir registry for query-staged artifacts (q38/q50/q71/q100/...):
  * every dir created here is recursively deleted by ONE JVM shutdown
  * hook, so repeated Verify/Bench runs stop accumulating staged parquet
  * under /tmp. Deletion is deferred to JVM exit (not per-query) because
  * per-JVM memoized artifacts ([[osm.SyntheticOsm.materialized]], the
  * staged dedup components) are re-read by later queries. */
object TempDirs {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookOnce: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => dirs.forEach(p => delete(p)),
      "graft-tempdir-cleanup"))

  def create(prefix: String): String = {
    hookOnce
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Eagerly delete a registered dir (a staged build that FAILED
    * mid-write leaves a half-written artifact that no reader will ever
    * consume — reclaiming it at JVM exit is too late for a long-lived
    * serving JVM that retries the build). No-op on unknown paths. */
  def deleteNow(dir: String): Unit = {
    val p = Path.of(dir)
    dirs.remove(p)
    delete(p)
  }

  private def delete(root: Path): Unit =
    try {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => try Files.deleteIfExists(p)
          catch { case _: Exception => })
      finally walk.close()
    } catch { case _: Exception => }
}
