package graft.osm

import graft.streaming.Replication
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** MVCC manifest contract (S4-lite/P6/U4) + replication utilities
  * (F7/F8). */
class ManifestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("read-at-version-N is stable while N+1 is committed") {
    val root = Files.createTempDirectory("graft-vt").toString
    val v1 = VersionedTable.commit(root,
      Map("t" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      Map("osmosis_replication_sequence_number" -> "100"))
    assert(v1 == 1L)
    val pinned = VersionedTable.current(root)
    assert(pinned.get.version == 1L)

    // a reader pins v1...
    val before = VersionedTable.read(spark, root, "t", pinned)
      .as[(Long, String)].collect().toSet

    // ...writer commits v2 with different content + advanced metadata
    VersionedTable.commit(root,
      Map("t" -> Seq((1L, "a"), (3L, "c")).toDF("id", "v")),
      Map("osmosis_replication_sequence_number" -> "101"))

    // pinned read still sees v1 exactly
    val after = VersionedTable.read(spark, root, "t", pinned)
      .as[(Long, String)].collect().toSet
    assert(before == after)
    assert(before == Set((1L, "a"), (2L, "b")))

    // unpinned read sees v2; metadata advanced atomically with it
    val now = VersionedTable.read(spark, root, "t")
      .as[(Long, String)].collect().toSet
    assert(now == Set((1L, "a"), (3L, "c")))
    assert(VersionedTable.metadata(root,
      "osmosis_replication_sequence_number").contains("101"))
    // merged: unrelated keys survive commits that don't touch them
    val v3 = VersionedTable.commit(root,
      Map("t" -> Seq((9L, "z")).toDF("id", "v")),
      Map("import_filename" -> "planet.osm.pbf"))
    assert(v3 == 3L)
    assert(VersionedTable.metadata(root,
      "osmosis_replication_sequence_number").contains("101"))
  }

  test("dry-run computes but does not publish (U4 without --commit)") {
    val root = Files.createTempDirectory("graft-vt-dry").toString
    VersionedTable.commit(root, Map("t" -> Seq((1L, "a")).toDF("id", "v")))
    val v = VersionedTable.commit(root,
      Map("t" -> Seq((2L, "b")).toDF("id", "v")), dryRun = true)
    assert(v == 2L) // data written for inspection...
    assert(VersionedTable.current(root).get.version == 1L) // ...not live
    val live = VersionedTable.read(spark, root, "t")
      .as[(Long, String)].collect().toSet
    assert(live == Set((1L, "a")))
  }

  test("replication URL format is AAA/BBB/CCC zero-padded (F7)") {
    assert(Replication.url("https://x/replication/minute", 4397511) ==
      "https://x/replication/minute/004/397/511")
    assert(Replication.url("b", 0) == "b/000/000/000")
    assert(Replication.url("b", 999999999L) == "b/999/999/999")
  }

  test("timestamp->seqnum binary search finds the last seq <= ts (F8)") {
    // synthetic monotone timeline: seq n has timestamp 1000 + 60n
    def ts(seq: Long): Long = 1000 + 60 * seq
    assert(Replication.timestampToSeqnum(ts, 0, 10000, 1000) == 0)
    assert(Replication.timestampToSeqnum(ts, 0, 10000, 1059) == 0)
    assert(Replication.timestampToSeqnum(ts, 0, 10000, 1060) == 1)
    assert(Replication.timestampToSeqnum(ts, 0, 10000, 601060) == 10000)
  }
}
