package graft.streaming

import graft.osm.{Changeset, VersionedTable}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Replication surface: seqnum <-> URL/timestamp utilities (F7/F8,
  * `utils/server.py:27-172`) and the continuous catch-up loop (U5,
  * `utils/osmx-update:15-48`) as a Structured Streaming job. */
object Replication {

  /** Replication path for a sequence number: zero-padded to 9 digits and
    * split `AAA/BBB/CCC` (`utils/server.py:153-172`'s `%03i/%03i/%03i`).
    */
  def url(base: String, seqnum: Long): String = {
    require(seqnum >= 0 && seqnum <= 999999999L, s"bad seqnum $seqnum")
    val s = f"$seqnum%09d"
    s"$base/${s.substring(0, 3)}/${s.substring(3, 6)}/${s.substring(6, 9)}"
  }

  /** Largest seqnum in [lo, hi] whose timestamp is <= `targetTs`
    * (`utils/server.py:27-106`'s interpolating search, simplified to
    * plain binary search — the fetcher is network-bound either way).
    * `fetchTs(seq)` returns the state-file timestamp for a seqnum. */
  def timestampToSeqnum(fetchTs: Long => Long, lo: Long, hi: Long,
                        targetTs: Long): Long = {
    var a = lo
    var b = hi
    var ans = lo
    while (a <= b) {
      val mid = (a + b) >>> 1
      if (fetchTs(mid) <= targetTs) { ans = mid; a = mid + 1 }
      else b = mid - 1
    }
    ans
  }

  /** Node-change schema consumed by the stream (a parquet-encoded
    * OsmChange batch: S3's role, with `visible=false` for deletes). */
  def changeSchema: StructType = StructType.fromDDL(
    "id BIGINT, visible BOOLEAN, lon INT, lat INT, version INT, " +
      "tags MAP<STRING,STRING>, " +
      "meta STRUCT<version:INT,timestamp:BIGINT,changeset:BIGINT," +
      "uid:BIGINT,user:STRING>, seqnum BIGINT")

  /** U5: continuous replication catch-up. Watches `changesDir` for new
    * change files; every micro-batch applies U1 (node upsert/delete)
    * against the CURRENT committed version of `tableRoot` and commits
    * exactly one new version with the max applied seqnum recorded in
    * the manifest meta (U4's atomic advance). The streaming checkpoint
    * makes delivery exactly-once: a restarted query re-reads no applied
    * batch, and an aborted batch never swapped the manifest.
    *
    * Watermarks/session windows are deliberately absent: OSM replication
    * is ordered, complete batches — late data cannot occur by
    * construction (SURVEY §2.8).
    */
  def catchUp(spark: SparkSession, changesDir: String, tableRoot: String,
              checkpointDir: String): StreamingQuery =
    spark.readStream.schema(changeSchema).parquet(changesDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val pinned = VersionedTable.current(tableRoot)
          val loc = VersionedTable.read(spark, tableRoot, "locations",
            pinned)
          val nodes = VersionedTable.read(spark, tableRoot, "nodes",
            pinned)
          val changes = batch.drop("seqnum")
          val (loc2, nodes2) =
            Changeset.applyNodeChanges(loc, nodes, changes)
          val maxSeq = batch.agg(org.apache.spark.sql.functions
            .max("seqnum")).head().getLong(0)
          VersionedTable.commit(tableRoot,
            Map("locations" -> loc2, "nodes" -> nodes2),
            Map("osmosis_replication_sequence_number" -> maxSeq.toString))
          ()
        }
      }
      .start()
}
