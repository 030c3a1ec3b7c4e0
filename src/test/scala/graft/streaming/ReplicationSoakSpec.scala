package graft.streaming

import graft.osm.VersionedTable
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import scala.util.Random

/** Concurrency soak of the full LMDB-MVCC analogue
  * (`docs/MANUAL.md:126`: one writer, many readers, reader snapshots
  * survive) on the STREAMING path: seeded interleavings of
  * [[Replication.catchUp]] rounds racing a continuous compactor, a
  * continuous vacuum, and a pinned time-travel reader, all against one
  * bucketed copy-on-write store.
  *
  * Contract pinned here (HistoryPropertySpec covers the batch plane):
  *   - exactly ONE committer wins each version: a catch-up batch and a
  *     compaction that both observed version N race their CAS claims
  *     for N+1; the loser throws [[VersionedTable.ConcurrentCommitException]]
  *     loudly and RETRIES FROM FRESH STATE (the stream restarts from
  *     its checkpoint; the compactor just re-runs) — no lost update,
  *     no silent skip, no version gap;
  *   - a reader pinned to an old manifest sees byte-identical content
  *     through every concurrent commit, compaction, and vacuum;
  *   - the final content equals the in-memory latest-version-wins fold
  *     of all diffs, no matter how the interleaving played out;
  *   - vacuum during the storm (ample retention) reaps nothing a
  *     pinned or in-flight reader needs; a tight-retention vacuum
  *     AFTER the storm prunes history and keeps current readable.
  */
class ReplicationSoakSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val metaT = "struct<version:int,timestamp:bigint," +
    "changeset:bigint,uid:bigint,user:string>"

  private def chg(id: Long, visible: Boolean, lon: Int, lat: Int,
                  version: Int, seq: Long): Row =
    Row(id, "node", visible, lon, lat, version, null, null, null, null,
      seq)

  private def writeChanges(dir: String, rows: Seq[Row]): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Replication.changeSchema)
      .coalesce(1).write.mode("append").parquet(dir)

  private def isConcurrentLoss(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .exists(_.isInstanceOf[VersionedTable.ConcurrentCommitException])

  /** With `lshStage = true` the storm ALSO runs a stateful streaming
    * LSH dedup (its own doc feed, file sink, state-store checkpoint)
    * concurrently with catch-up + compactor + vacuum — the state-store
    * vs CoW-GC cross-product the r11 verdict called untested — and
    * KILLS/RESTARTS the stream from its checkpoint mid-storm. The
    * stream's final pair set must equal the batch engine on the same
    * corpus: a restart that lost band-membership state would miss every
    * cross-restart pair, so the equality IS the recovery proof. */
  private def runStorm(seed: Int, nRounds: Int,
                       lshStage: Boolean = false): Unit = {
    val rnd = new Random(seed)
    val root = Files.createTempDirectory(s"graft-soak-$seed").toString
    val changesDir = Files.createTempDirectory(s"graft-soak-osc-$seed")
      .toString
    val ckpt = Files.createTempDirectory(s"graft-soak-ckpt-$seed")
      .toString
    val docsDir = Files.createTempDirectory(s"graft-soak-docs-$seed")
      .toString
    val pairsDir = Files.createTempDirectory(s"graft-soak-pairs-$seed")
      .toString
    val lshCkpt = Files.createTempDirectory(s"graft-soak-lshck-$seed")
      .toString

    // base snapshot v1: ids 1..20
    val base = (1L to 20L).map(i => (i, i.toInt * 10, i.toInt * 10, 1))
    VersionedTable.commitBucketed(root, Map(
      "locations" -> (base.toDF("id", "lon", "lat", "version"), "id"),
      "nodes" -> (Seq((1L, Map("a" -> "b"))).toDF("id", "tags")
        .withColumn("meta", org.apache.spark.sql.functions.lit(null)
          .cast(metaT)), "id")),
      nBuckets = 4,
      meta = Map("osmosis_replication_sequence_number" -> "0"))
    val pinnedManifest = VersionedTable.manifestAt(root, 1L).get
    val baseSet = base.toSet

    // model fold: latest-version-wins over (id -> row or delete)
    var model: Map[Long, (Int, Int, Int)] =
      base.map { case (id, lon, lat, v) => id -> ((lon, lat, v)) }.toMap

    val stop = new AtomicBoolean(false)
    val readerViolations = new AtomicInteger(0)
    val threadErrors = new AtomicInteger(0)
    val compactWins = new AtomicInteger(0)
    val compactLosses = new AtomicInteger(0)
    val streamRetries = new AtomicInteger(0)

    // Compaction cadence matters: a hot-loop compactor holds a claim
    // ~90%+ of wall time (each compact is a multi-hundred-ms commit),
    // and the CDC applier — whose retry is a seconds-long stream
    // restart — can livelock out of the tiny claim window. The first
    // run of this spec measured exactly that (26 consecutive CAS
    // losses). Production compaction is an occasional maintenance op;
    // the test models that with a few-hundred-ms cadence, which still
    // produces real claim races every storm (see the printed
    // compactWins/streamRetries).
    val compactor = new Thread(() => {
      while (!stop.get()) {
        try { VersionedTable.compact(spark, root, "locations")
              compactWins.incrementAndGet(); () }
        catch {
          case t: Throwable if isConcurrentLoss(t) =>
            compactLosses.incrementAndGet(); () // loud loss; retry fresh
          case _: Throwable => threadErrors.incrementAndGet(); ()
        }
        Thread.sleep(300 + rnd.nextInt(400).toLong)
      }
    }, s"soak-compactor-$seed")

    val vacuumer = new Thread(() => {
      while (!stop.get()) {
        try VersionedTable.vacuum(root, retainVersions = 500)
        catch { case _: Throwable => threadErrors.incrementAndGet(); () }
        Thread.sleep(25 + rnd.nextInt(50).toLong)
      }
    }, s"soak-vacuum-$seed")

    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = VersionedTable.read(spark, root, "locations",
            Some(pinnedManifest))
            .as[(Long, Int, Int, Int)].collect().toSet
          if (got != baseSet) readerViolations.incrementAndGet()
        } catch { case _: Throwable =>
          threadErrors.incrementAndGet(); () }
        Thread.sleep(15 + rnd.nextInt(30).toLong)
      }
    }, s"soak-reader-$seed")

    Seq(compactor, vacuumer, reader).foreach { t =>
      t.setDaemon(true); t.start()
    }

    // optional concurrent stateful stage: streaming LSH near-dup over
    // its own id-ordered doc feed, fault-tolerant file sink
    val dupA = "the quick brown fox jumps over the lazy dog again"
    val dupB = "pack my box with five dozen liquor jugs right now"
    var fedDocs = Vector.empty[(Long, String)]
    def startLsh() = StreamingNearDup.candidatePairs(
      spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(docsDir),
      "text", "doc_id")
      .writeStream.outputMode("append").format("parquet")
      .option("path", pairsDir)
      .option("checkpointLocation", lshCkpt)
      .start()
    var lshQ: Option[org.apache.spark.sql.streaming.StreamingQuery] =
      if (lshStage) {
        // seed batch so the feed dir exists before the stream starts
        fedDocs = Vector(1000L -> dupA,
          1001L -> s"seed filler ${rnd.nextInt()} words")
        fedDocs.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(docsDir)
        Some(startLsh())
      } else None

    try {
      (1 to nRounds).foreach { round =>
        // one replication interval: a few random node ops at seqnum=round
        val ops = (0 until 1 + rnd.nextInt(4)).map { _ =>
          val id = 1L + rnd.nextInt(25) // some ids beyond base: creates
          if (rnd.nextInt(5) == 0)
            chg(id, visible = false, 0, 0, round + 1, round.toLong)
          else
            chg(id, visible = true, rnd.nextInt(1000), rnd.nextInt(1000),
              round + 1, round.toLong)
        }
        // dedupe ops per id inside one diff the way applyBatch's
        // latest-version-wins would: keep the LAST op per id
        val lastPerId = ops.groupBy(_.getLong(0)).map(_._2.last).toSeq
        lastPerId.foreach { r =>
          val id = r.getLong(0)
          if (r.getBoolean(2)) model += id -> ((r.getInt(3), r.getInt(4),
            r.getInt(5)))
          else model -= id
        }
        writeChanges(changesDir, lastPerId)

        // catch-up for this interval, retrying on CAS losses to the
        // compactor (the stream restarts from its checkpoint — the
        // documented operator response to ConcurrentCommitException)
        var done = false
        var attempts = 0
        while (!done) {
          val q = Replication.catchUp(spark, changesDir, root, ckpt)
          try { q.awaitTermination(); done = true }
          catch {
            case t: Throwable if isConcurrentLoss(t) && attempts < 60 =>
              attempts += 1; streamRetries.incrementAndGet()
            case t: Throwable => throw t
          }
        }

        // concurrent LSH stage: feed this round's docs (ascending ids,
        // a mix of repeated near-dup content and unique fillers) and
        // drain; mid-storm, KILL the stream and restart from its
        // checkpoint — pairs spanning the restart need the recovered
        // band-membership state
        lshQ.foreach { q =>
          val docs = (0 until 1 + rnd.nextInt(3)).map { k =>
            val id = 1000L + round * 10L + k
            val text = rnd.nextInt(4) match {
              case 0 => dupA
              case 1 => dupB
              case _ => s"unique filler ${rnd.nextInt()} " +
                s"${rnd.nextInt()} words $id"
            }
            (id, text)
          }
          fedDocs ++= docs
          docs.toDF("doc_id", "text")
            .coalesce(1).write.mode("append").parquet(docsDir)
          q.processAllAvailable()
          if (round == nRounds / 2) {
            q.stop()
            lshQ = Some(startLsh()) // state recovers from checkpoint
          }
        }
      }
    } finally {
      stop.set(true)
      Seq(compactor, vacuumer, reader).foreach(_.join(20000))
      lshQ.foreach { q =>
        try { q.processAllAvailable(); q.stop() }
        catch { case _: Throwable => () }
      }
    }

    // ---- LSH-stage invariant: streaming pairs (across the restart)
    // equal the batch engine on the identical corpus. No bucket here
    // approaches the cap, where the any-band/first-band rules agree,
    // so set equality is exact — and a restart that lost state would
    // miss every pair whose members straddle the kill point. ----
    if (lshStage) {
      val streamed = spark.read.schema("a BIGINT, b BIGINT")
        .parquet(pairsDir)
        .select($"a", $"b").distinct()
        .as[(Long, Long)].collect().toSet
      val batch = graft.llm.Dedup.minhashCandidatePairs(
        fedDocs.toDF("doc_id", "text"), "text", "doc_id")
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"seed=$seed: streaming LSH diverged from batch after restart\n" +
          s" streamed-only=${(streamed -- batch).toSeq.sorted}\n" +
          s" batch-only=${(batch -- streamed).toSeq.sorted}")
      assert(batch.nonEmpty, // the storm must actually exercise pairs
        s"seed=$seed: degenerate LSH corpus (no pairs) — seed choice bug")
    }

    // ---- post-storm invariants ----
    assert(threadErrors.get() == 0,
      s"seed=$seed: background thread errors (non-CAS)")
    assert(readerViolations.get() == 0,
      s"seed=$seed: pinned reader saw a mutated snapshot")

    val finalLoc = VersionedTable.read(spark, root, "locations")
      .as[(Long, Int, Int, Int)].collect().toSet
    val want = model.map { case (id, (lon, lat, v)) => (id, lon, lat, v) }
      .toSet
    assert(finalLoc == want,
      s"seed=$seed: content diverged\n got=${finalLoc.toSeq.sorted}\n" +
        s"want=${want.toSeq.sorted}")
    assert(VersionedTable.metadata(root,
      "osmosis_replication_sequence_number").contains(nRounds.toString),
      s"seed=$seed: seqnum metadata did not advance to $nRounds")

    // exactly one committer per version: every version from 1 to
    // current has exactly one durable manifest, no gaps (a gap would
    // mean a claim published nothing yet the next commit skipped it)
    val cur = VersionedTable.current(root).get.version
    (1L to cur).foreach { v =>
      assert(VersionedTable.manifestAt(root, v).isDefined,
        s"seed=$seed: version gap at v=$v (current=$cur)")
    }

    // tight-retention vacuum AFTER the storm: history pruned, current
    // still reads, the old pinned manifest resolves no more
    VersionedTable.vacuum(root, retainVersions = 2)
    if (cur > 2)
      assert(VersionedTable.manifestAt(root, 1L).isEmpty,
        s"seed=$seed: v=1 survived tight vacuum")
    assert(VersionedTable.read(spark, root, "locations")
      .as[(Long, Int, Int, Int)].collect().toSet == want,
      s"seed=$seed: current unreadable after tight vacuum")

    System.err.println(s"[soak seed=$seed] versions=$cur " +
      s"compactWins=${compactWins.get()} " +
      s"compactLosses=${compactLosses.get()} " +
      s"streamRetries=${streamRetries.get()}")
  }

  test("streaming catch-up vs compaction vs vacuum vs pinned reader: " +
    "seeded storms keep every invariant") {
    runStorm(seed = 7, nRounds = 3)
    runStorm(seed = 23, nRounds = 3)
  }

  test("storm + concurrent stateful LSH stage: state survives a " +
    "mid-storm kill/restart; streaming pairs == batch (r12)") {
    runStorm(seed = 41, nRounds = 4, lshStage = true)
  }
}
