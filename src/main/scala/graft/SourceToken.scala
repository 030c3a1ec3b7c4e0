package graft

/** Content/version token for a file-backed DataFrame, folded into the
  * staged-artifact memo keys ([[llm.Dedup.stagedCandidatePairs]],
  * [[llm.Similarity.stagedKnnEdges]], [[llm.TextFunctions.stagedDocLengths]],
  * [[osm.SyntheticOsm.materialized]]).
  *
  * Why: those caches were keyed by the caller's `cacheKey` (the source
  * dir path) alone, with a documented "the corpus must be immutable"
  * contract — re-provisioning the data at the SAME path within one JVM
  * (or across JVMs for the shared OSM bundle) would silently serve
  * stale artifacts to every consumer. Hashing each backing file's
  * (path, length, mtime) makes that hazard structural: new content =>
  * new token => cold rebuild. Driver-side only (the listing is already
  * cached in the scan's FileIndex); no job, no file reads.
  */
object SourceToken {

  /** Hex token over the frame's backing files' (path, size, mtime);
    * "nofiles" for frames with no file provenance (in-memory ranges,
    * streaming sources) — those keep the caller-key-only behavior. */
  def of(df: org.apache.spark.sql.DataFrame): String = try {
    val files = df.inputFiles.sorted
    if (files.isEmpty) return "nofiles"
    val md = java.security.MessageDigest.getInstance("MD5")
    files.foreach { f =>
      val stat = try {
        val p = java.nio.file.Paths.get(
          if (f.startsWith("file:")) new java.net.URI(f).getPath else f)
        val sz = java.nio.file.Files.size(p)
        val mt = java.nio.file.Files.getLastModifiedTime(p).toMillis
        s"$f|$sz|$mt"
      } catch { case _: Throwable => f } // non-local FS: path-only
      md.update(stat.getBytes("UTF-8"))
      md.update('\n'.toByte)
    }
    md.digest().take(8).map(b => f"$b%02x").mkString
  } catch { case _: Throwable => "nofiles" }

  /** Same token over every regular file under a local directory tree
    * (relative path, size, mtime) — for caches keyed by a source DIR
    * rather than a frame (the shared OSM bundle). */
  def ofDir(dir: String): String = try {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return "nodir"
    val md = java.security.MessageDigest.getInstance("MD5")
    val stream = java.nio.file.Files.walk(root)
    try {
      val it = stream.filter(java.nio.file.Files.isRegularFile(_))
        .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](
          _.toString))
        .iterator()
      while (it.hasNext) {
        val p = it.next()
        val stat = try {
          val sz = java.nio.file.Files.size(p)
          val mt = java.nio.file.Files.getLastModifiedTime(p).toMillis
          s"${root.relativize(p)}|$sz|$mt"
        } catch { case _: Throwable => root.relativize(p).toString }
        md.update(stat.getBytes("UTF-8"))
        md.update('\n'.toByte)
      }
    } finally stream.close()
    md.digest().take(8).map(b => f"$b%02x").mkString
  } catch { case _: Throwable => "nodir" }
}
