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
    * indices and replay order are always exactly as given.
    *
    * The per-batch write JOBS are independent (each stages into its own
    * dir with an identical single-task coalesce(1) plan), so they run
    * from a small driver pool and overlap (optimization-guide §2.6) —
    * staging a 5-batch feed was otherwise five strictly sequential
    * near-idle jobs. File CONTENT and in-file row order are exactly the
    * sequential version's; the mtime stamping that defines replay
    * order stays a sequential post-pass. */
  def stageBatches(batches: Seq[DataFrame]): String = {
    val feed = graft.TempDirs.create("graft-stream-feed")
    val base = new java.io.File(feed).lastModified()
    val stages = batches.indices.map(_ =>
      graft.TempDirs.create("graft-stream-stage"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, math.max(1, batches.size)))
    try {
      val fs = batches.zip(stages).map { case (b, stage) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            b.coalesce(1).write.mode("overwrite").parquet(stage)
        })
      }
      fs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
    stages.zipWithIndex.foreach { case (stage, k) =>
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
