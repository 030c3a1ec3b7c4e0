package graft.streaming

import org.apache.spark.sql.DataFrame

/** Stages a sequence of DataFrames as an mtime-ordered parquet file
  * feed for `readStream.option("maxFilesPerTrigger", 1)`: batch k
  * becomes one part file `batch-0k.parquet` with a strictly ascending
  * mtime, so AvailableNow replays the batches in exactly the given
  * order — the deterministic substitute for a live source that lets a
  * streaming operator be oracle-compared against batch semantics
  * (q104/q105 dedup, q114 watermarked windows).
  */
object FeedStage {

  /** Write `batches` into a fresh feed dir, one file per batch, in
    * order. An empty batch still yields a (zero-row) file, so batch
    * indices and replay order are always exactly as given. */
  def stageBatches(batches: Seq[DataFrame]): String = {
    val feed = graft.TempDirs.create("graft-stream-feed")
    val base = new java.io.File(feed).lastModified()
    batches.zipWithIndex.foreach { case (b, k) =>
      val stage = graft.TempDirs.create("graft-stream-stage")
      b.coalesce(1).write.mode("overwrite").parquet(stage)
      // an empty batch still yields one (zero-row) part file, so a
      // missing part means the write itself went wrong — say so
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .headOption.getOrElse(throw new IllegalStateException(
          s"stageBatches: no parquet part written for batch $k " +
            s"under $stage"))
      val dst = new java.io.File(feed, f"batch-$k%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // replay order depends on mtime; if the filesystem refuses the
      // stamp, the zero-padded batch-NN names still sort correctly
      // (Spark breaks mtime ties by path), but fail loudly rather
      // than degrade silently
      if (!dst.setLastModified(base + k * 10000L))
        throw new IllegalStateException(
          s"stageBatches: setLastModified failed for $dst — " +
            "mtime-ordered replay cannot be guaranteed here")
    }
    feed
  }
}
