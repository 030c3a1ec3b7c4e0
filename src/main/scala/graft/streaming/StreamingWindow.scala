package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Watermarked tumbling-window streaming aggregation — the canonical
  * Structured-Streaming shape (`withWatermark` + `window()` + Append),
  * run over a staged file feed so its late-data semantics are exactly
  * reproducible:
  *
  *   - the watermark after each micro-batch is
  *     `floor(max_event_time_us / 1000) ms - delay` (Spark tracks
  *     event-time stats in milliseconds) and never regresses;
  *   - Spark keeps TWO watermark values per batch (SPARK-40925): late
  *     rows are filtered against the PREVIOUS batch's watermark, state
  *     eviction/emission uses the CURRENT one. So an arriving row is
  *     DROPPED iff its window end <= the watermark derived from the
  *     batches up to TWO before it; a row only one batch behind still
  *     merges into its (never-yet-evicted) window — eviction lags the
  *     same way, so append mode still emits each key exactly once;
  *   - a window is EMITTED (append mode) once the eviction watermark
  *     passes its end; AvailableNow runs a final no-data micro-batch
  *     after the last file, so windows closed by the last batch's
  *     watermark advance are flushed before termination.
  *
  * Scale notes (100 TB design): state is hash-partitioned on
  * (window, key) with one partial aggregate row per live window —
  * bounded by the watermark delay, not the stream length. The exact
  * DECIMAL sum keeps emitted values independent of partitioning and
  * arrival order (same money rule as the batch queries). Late rows are
  * filtered BEFORE the shuffle (watermark predicate on the map side).
  */
object StreamingWindow {

  /** Run the aggregation over `feed` (schema: ts TIMESTAMP,
    * event_type STRING, value DOUBLE) with `windowSec` tumbling
    * windows and a `delaySec` watermark, one file per micro-batch, and
    * return the append-mode output that was emitted. */
  def windowedAgg(spark: SparkSession, feed: String,
                  windowSec: Long, delaySec: Long): DataFrame = {
    val ckpt = graft.TempDirs.create("graft-swin-ckpt")
    val outDir = graft.TempDirs.create("graft-swin-out")
    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(feed)
    val sq = StatePartitions.sized(spark, 8) { stream
      .withWatermark("ts", s"$delaySec seconds")
      .groupBy(window(col("ts"), s"$windowSec seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).as("dec_sum"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("dec_sum").cast("double").as("sum_value"))
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    }
    sq.awaitTermination()
    spark.read
      .schema("win_start TIMESTAMP, event_type STRING, n BIGINT, " +
        "sum_value DOUBLE")
      .parquet(outDir)
  }

  /** Streaming SESSION windows (native `session_window` + watermark +
    * Append) over a feed (schema: ts TIMESTAMP, user_id BIGINT,
    * value DOUBLE): per-user sessions that close `gapSec` after their
    * last event. Under a TIME-ORDERED replay nothing is ever late
    * (every new row's ts exceeds every prior batch's max, hence any
    * lagged watermark), and an emitted session can never be reopened —
    * a later event would need ts < last + gap, but ts >= watermark +
    * delay >= last + gap + delay. So the streamed result equals batch
    * sessionization exactly (the q67 semantics), which is what q115
    * oracle-gates; cross-batch sessions still exercise the session
    * state-store merge.
    *
    * Scale notes: state is hash-partitioned on user_id with one row
    * per OPEN session — bounded by gap + delay versus event-time
    * skew, not stream length. Exact DECIMAL sums as everywhere. */
  def sessionAgg(spark: SparkSession, feed: String,
                 gapSec: Long, delaySec: Long): DataFrame = {
    val ckpt = graft.TempDirs.create("graft-ssess-ckpt")
    val outDir = graft.TempDirs.create("graft-ssess-out")
    val stream = spark.readStream
      .schema("ts TIMESTAMP, user_id BIGINT, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(feed)
    val sq = StatePartitions.sized(spark, 8) { stream
      .withWatermark("ts", s"$delaySec seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).as("dec_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("dec_sum").cast("double").as("sum_value"))
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(outDir)
    }
    sq.awaitTermination()
    spark.read
      .schema("user_id BIGINT, session_start TIMESTAMP, " +
        "session_end TIMESTAMP, n_events BIGINT, sum_value DOUBLE")
      .parquet(outDir)
  }
}
