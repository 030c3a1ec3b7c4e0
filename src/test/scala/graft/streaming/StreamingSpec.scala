package graft.streaming

import graft.osm.VersionedTable
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** U5: replication catch-up via Structured Streaming with exactly-once
  * manifest commits. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def writeChanges(dir: String, name: String,
                           rows: Seq[Row]): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Replication.changeSchema)
    df.coalesce(1).write.mode("append").parquet(dir)
    // (append into the watched dir; each call lands as >=1 new file)
  }

  private def chg(id: Long, visible: Boolean, lon: Int, lat: Int,
                  version: Int, seq: Long): Row =
    Row(id, visible, lon, lat, version, null, null, seq)

  test("watermarked tumbling-window aggregation over a file stream") {
    import org.apache.spark.sql.functions._
    val inDir = Files.createTempDirectory("graft-evt").toString
    val ckpt = Files.createTempDirectory("graft-evt-ckpt").toString
    val outDir = Files.createTempDirectory("graft-evt-out").toString

    // two batches of (ts, v) events across two hours
    Seq(("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:55:00", 2.0),
      ("2024-01-01 11:10:00", 4.0))
      .toDF("ts_s", "v").withColumn("ts", to_timestamp($"ts_s"))
      .select("ts", "v").write.mode("append").parquet(inDir)

    val q = spark.readStream
      .schema("ts TIMESTAMP, v DOUBLE").parquet(inDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .select(date_format($"w.start", "HH:mm").as("h"), $"n", $"sv")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q.awaitTermination()
    // append mode emits only watermark-closed windows; push the
    // watermark past 11:00 with a late-ish second batch and rerun
    Seq(("2024-01-01 12:30:00", 8.0))
      .toDF("ts_s", "v").withColumn("ts", to_timestamp($"ts_s"))
      .select("ts", "v").write.mode("append").parquet(inDir)
    val q2 = spark.readStream
      .schema("ts TIMESTAMP, v DOUBLE").parquet(inDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .select(date_format($"w.start", "HH:mm").as("h"), $"n", $"sv")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q2.awaitTermination()

    val got = spark.read.parquet(outDir)
      .as[(String, Long, Double)].collect()
      .map { case (h, n, sv) => h -> ((n, sv)) }.toMap
    // the 10:00 and 11:00 windows are closed once the watermark passed
    assert(got.get("10:00").contains((2L, 3.0)), s"got $got")
    assert(got.get("11:00").contains((1L, 4.0)), s"got $got")
  }

  test("catch-up applies ordered diffs and advances seqnum atomically") {
    val root = Files.createTempDirectory("graft-repl").toString
    val changesDir = Files.createTempDirectory("graft-osc").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    // base snapshot: 3 nodes
    VersionedTable.commit(root, Map(
      "locations" -> Seq((1L, 10, 10, 1), (2L, 20, 20, 1),
        (3L, 30, 30, 1)).toDF("id", "lon", "lat", "version"),
      "nodes" -> spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, tags MAP<STRING,STRING>, " +
            "meta STRUCT<version:INT,timestamp:BIGINT,changeset:BIGINT," +
            "uid:BIGINT,user:STRING>"))),
      Map("osmosis_replication_sequence_number" -> "0"))

    // diff 1: move node 1, delete node 2; diff 2: create node 4
    writeChanges(changesDir, "b1", Seq(
      chg(1L, visible = true, 11, 11, 2, 1L),
      chg(2L, visible = false, 0, 0, 2, 1L)))
    writeChanges(changesDir, "b2", Seq(
      chg(4L, visible = true, 40, 40, 1, 2L)))

    val q = Replication.catchUp(spark, changesDir, root, ckpt)
    q.awaitTermination()

    val loc = VersionedTable.read(spark, root, "locations")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(loc == Set((1L, 11, 11, 2), (3L, 30, 30, 1), (4L, 40, 40, 1)),
      s"got $loc")
    assert(VersionedTable.metadata(root,
      "osmosis_replication_sequence_number").contains("2"))
    val committed = VersionedTable.current(root).get.version

    // exactly-once: rerunning with the same checkpoint applies nothing
    val q2 = Replication.catchUp(spark, changesDir, root, ckpt)
    q2.awaitTermination()
    assert(VersionedTable.current(root).get.version == committed)
  }
}
