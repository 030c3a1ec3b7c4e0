package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run StreamingNearDup alone over a corpus dir and dump
  * per-micro-batch progress JSON (state-operator update/commit times,
  * sink add-batch time, rows emitted) — the diagnostic loop for the
  * scale-slope work. Not part of the driver surface.
  *
  * Usage: runMain graft.tools.ProbeStreaming <sfDir> [maxBucketOverride]
  */
object ProbeStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.Queries.T(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val corpusSize = docs.count()
    val cap = if (args.length > 1) args(1).toInt
              else (corpusSize + 1L).min(Int.MaxValue).toInt
    val feed = graft.llm.LlmQueries.stageFileFeed(docs, nb = 4)
    val ckpt = graft.TempDirs.create("graft-probe-ckpt")
    val outDir = graft.TempDirs.create("graft-probe-out")
    val t0 = System.nanoTime()
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(feed)
    val sq = graft.streaming.StreamingNearDup
      .candidatePairs(stream, "text", "doc_id", maxBucket = cap)
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(outDir)
    sq.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    sq.recentProgress.foreach(p => println("PROGRESS " + p.json))
    val n = spark.read.schema("a BIGINT, b BIGINT, band INT")
      .parquet(outDir).count()
    println(f"PROBE wall=$wall%.1fs emitted=$n corpus=$corpusSize cap=$cap")
    spark.stop()
  }
}
