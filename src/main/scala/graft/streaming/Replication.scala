package graft.streaming

import graft.osm.{Changeset, VersionedTable}
import graft.osm.VersionedTable.Delta
import org.apache.spark.sql.functions._
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

  /** Largest seqnum in [lo, hi] whose timestamp is <= `targetTs`,
    * CLAMPED to `lo` for pre-horizon targets (every state file newer
    * than `targetTs`): the requested point-in-time predates the
    * server's retention, and starting from the earliest available
    * diff is the only action that loses no AVAILABLE data — callers
    * that must distinguish "exact" from "clamped" compare
    * `fetchTs(lo)` to `targetTs`. The clamp is part of the q106 data
    * plane (`coalesce(m, lo)` in its oracle) and pinned by
    * ManifestSpec. (`utils/server.py:27-106`'s interpolating search,
    * simplified to plain binary search — the fetcher is network-bound
    * either way.) `fetchTs(seq)` returns the state-file timestamp for
    * a seqnum. */
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

  /** Full-element change schema consumed by the stream (a
    * parquet-encoded OsmChange batch: S3's role). One row per changed
    * element; `etype` selects node|way|relation, `visible=false` is a
    * delete; the payload columns not applicable to the etype are null
    * (`nodes` for ways, `members` for relations). */
  def changeSchema: StructType = StructType.fromDDL(
    "id BIGINT, etype STRING, visible BOOLEAN, lon INT, lat INT, " +
      "version INT, nodes ARRAY<BIGINT>, " +
      "members ARRAY<STRUCT<ref:BIGINT,mtype:STRING,role:STRING>>, " +
      "tags MAP<STRING,STRING>, " +
      "meta STRUCT<version:INT,timestamp:BIGINT,changeset:BIGINT," +
      "uid:BIGINT,user:STRING>, seqnum BIGINT")

  private val SeqKey = "osmosis_replication_sequence_number"
  private val BatchIdKey = "streaming_batch_id"

  /** Outcome of [[applyBatch]]. The three cases need different operator
    * responses (the reference's update loop distinguishes them too,
    * `src/update.cpp:280-291`): `Applied` is the normal commit (or
    * dry-run compute); `EmptyDiff` means the change set had zero rows —
    * a quiet replication interval, NOT an error, and under `--commit`
    * the CLI still records the seqnum so an automated catch-up loop
    * advances instead of wedging on the same empty diff forever;
    * `ReplayedBatch` means the store's last applied batch id already
    * equals this batch's id (at-least-once redelivery) — a no-op by
    * design, loud only when a human asked for that exact seqnum. */
  sealed trait ApplyResult
  object ApplyResult {
    case object Applied extends ApplyResult
    /** Carries the manifest version the emptiness/replay guards were
      * evaluated against, so a caller recording the seqnum anyway (the
      * CLI's `--commit` path) can make its metadata commit ATOMIC with
      * this validation via `commitDelta(expectedVersion = ...)` — a
      * concurrent committer landing in between otherwise records a
      * stale or duplicate seqnum (r11 advice). */
    final case class EmptyDiff(observedVersion: Long) extends ApplyResult
    case object ReplayedBatch extends ApplyResult
  }

  /** Metadata-only commit: advance the replication seqnum (+ extra keys,
    * e.g. the timestamp) with NO data change — one new manifest version,
    * every bucket linked to its prior file. This is how an empty diff
    * under `--commit` still moves the catch-up cursor forward (the
    * reference commits the metadata txn unconditionally,
    * `src/update.cpp:283-287`); without it a quiet replication interval
    * wedges an automated loop on the same seqnum forever. */
  def recordReplicationMeta(spark: SparkSession, root: String,
                            seqnum: Long,
                            extraMeta: Map[String, String] = Map.empty,
                            expectedVersion: Option[Long] = None)
  : Long =
    VersionedTable.commitDelta(spark, root, Map.empty,
      Map(SeqKey -> seqnum.toString, BatchIdKey -> seqnum.toString) ++
        extraMeta, expectedVersion = expectedVersion)

  /** U5: continuous replication catch-up over a BUCKETED copy-on-write
    * store ([[VersionedTable.commitBucketed]]). Watches `changesDir`
    * for new change files; every micro-batch applies U1/U2/U3 (node,
    * way AND relation changes with adjacency recompute) and commits ONE
    * new version whose manifest rewrites only the buckets containing
    * changed keys — the reference's O(changes) LMDB update
    * (`utils/osmx-update:15-48`, `src/update.cpp:17-226`), not a
    * full-table rewrite. The max applied seqnum lands in the manifest
    * meta atomically with the data (U4).
    *
    * Delivery is idempotent at-least-once: foreachBatch may re-deliver
    * a batch whose manifest commit already landed (crash between the
    * manifest swap and the checkpoint commit), so the manifest records
    * the applied streaming batch id and a replayed batch is a no-op.
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a skipped batch (replay-guard no-op or empty micro-batch) must
        // be VISIBLE in the streaming log too, not just the CLI path —
        // an operator tailing the job should never wonder why a version
        // didn't advance (same contract as cmdUpdate's loud false)
        applyBatch(spark, tableRoot, batch, batchId) match {
          case ApplyResult.Applied => ()
          case skipped =>
            System.err.println(s"[replication] batch $batchId at " +
              s"$tableRoot skipped: $skipped")
        }
      }
      .start()

  /** Apply one change micro-batch as a single copy-on-write commit.
    * Tables absent from the store's manifest are skipped, so a
    * node-only store and the full 8-table store both work.
    * `dryRun` computes every delta but rolls back instead of
    * publishing (the reference's default update mode,
    * `src/update.cpp:280-291`); `extraMeta` adds CLI-supplied keys
    * (e.g. the replication timestamp) to the committed manifest.
    * Returns [[ApplyResult.Applied]] when the batch was applied (or
    * dry-run-computed), [[ApplyResult.EmptyDiff]] for a zero-row
    * change set, [[ApplyResult.ReplayedBatch]] when the store's last
    * applied batch id already equals `batchId` (at-least-once replay
    * guard). Callers decide the response: the CLI records metadata and
    * exits 0 on an empty diff but fails loudly on a replay; the
    * streaming loop logs both. */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
                 batchId: Long, dryRun: Boolean = false,
                 extraMeta: Map[String, String] = Map.empty): ApplyResult = {
    val prev = VersionedTable.current(root).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    // replay guard BEFORE the emptiness probe: a redelivered batch id
    // must report ReplayedBatch even when its diff is empty (otherwise
    // the CLI's EmptyDiff path would re-record an already-applied
    // seqnum), and the manifest read is cheaper than the Spark job
    // isEmpty runs anyway
    if (prev.meta.get(BatchIdKey).contains(batchId.toString))
      return ApplyResult.ReplayedBatch
    if (batch.isEmpty) return ApplyResult.EmptyDiff(prev.version)
    val bk = prev.buckets
    require(bk.nonEmpty,
      s"catch-up needs a bucketed store at $root (commitBucketed)")
    // the locations upsert recomputes the s2cell index column
    graft.functions.GraftFunctions.register(spark)
    // Latest-version-wins dedup (A8) BEFORE applying: AvailableNow
    // coalesces many diff files into one micro-batch (up to 1000), so
    // one element can legitimately appear at several seqnums (created
    // then modified across minutely diffs). The reference applies rows
    // strictly in file order (`src/update.cpp:228-291`, single
    // writer); the batch-set equivalent is keeping only the last
    // change per element — without this, the anti-join/union delta
    // keeps BOTH versions as duplicate rows (CdcPropertySpec pins
    // this). Per-element window: partitioned by id, never global.
    // The ordering is a TOTAL order: after (seqnum, version) — the real
    // replication ordering — ties can only come from a malformed diff
    // repeating an element at the same version. Those resolve by
    // meta timestamp, then visible=false first (at a dead tie the
    // delete is the terminal state), then a content hash so the winner
    // is arbitrary-but-deterministic, never partition-order-dependent.
    // last-resort content tiebreaker (malformed diffs only — the real
    // ordering is (seqnum, version, timestamp, visible) above, and a
    // well-formed batch never reaches the hash). r16: hash the columns
    // directly instead of xxhash64(to_json(struct(*))) — JSON text
    // construction ran per input row and is pure per-task CPU; the
    // direct hash is codegen'd. Maps are not hashable in Spark, so
    // tags hashes via its sorted entry array — still a deterministic
    // function of the row's CONTENT, which is all the contract asks
    // (the winner is arbitrary-but-deterministic either way).
    // SPARK_GRAFT_CHANGE_HASH=json restores the old form (A/B lever).
    val contentHash =
      if (sys.env.get("SPARK_GRAFT_CHANGE_HASH").contains("json"))
        xxhash64(to_json(struct(col("*"))))
      else xxhash64(batch.columns.map {
        case "tags" => sort_array(map_entries(col("tags")))
        case c => col(c)
      }: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("etype"), col("id"))
      .orderBy(col("seqnum").desc,
        coalesce(col("version"), col("meta.version"), lit(0)).desc,
        coalesce(col("meta.timestamp"), lit(0L)).desc,
        col("visible").asc_nulls_last,
        contentHash.desc)
    val changes = batch
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1).drop("_rk")
      .persist()
    try {
      val nodeCh = changes.where(col("etype") === "node")
      val wayCh = changes.where(col("etype") === "way")
      val relCh = changes.where(col("etype") === "relation")
      val nodeIds = nodeCh.select(col("id")).distinct()
      val wayIds = wayCh.select(col("id")).distinct()
      val relIds = relCh.select(col("id")).distinct()

      val deltas = scala.collection.mutable.Map[String, Delta]()
      // every bucketsOf is a driver ACTION — per-batch action count is
      // the version store's fixed cost. Tables keyed the same way over
      // the same id set share ONE job (locations+nodes both bucket the
      // node ids by "id"; parentsOf re-asks for the ways/relations
      // sets byId already computed). keysTag identifies WHICH id set,
      // since all element tables share the key column name (r16).
      val bucketJobs =
        scala.collection.mutable.Map[(Int, String, Int), Seq[Int]]()
      def bucketsOfCached(keysTag: Int, keys: DataFrame, key: String,
                          nBuckets: Int): Seq[Int] =
        bucketJobs.getOrElseUpdate((keysTag, key, nBuckets),
          VersionedTable.bucketsOf(keys, key, nBuckets))
      def byId(table: String, keysTag: Int, keys: DataFrame,
               transform: DataFrame => DataFrame): Unit =
        bk.get(table).foreach { spec =>
          deltas += table -> Delta(
            bucketsOfCached(keysTag, keys, spec.key, spec.nBuckets),
            transform)
        }

      // U1 — coordinate store + tagged-node blobs
      byId("locations", 0, nodeIds, Changeset.delta.locations(nodeCh))
      byId("nodes", 0, nodeIds, Changeset.delta.nodeBlobs(nodeCh))
      // U2a / U3a — way and relation element tables
      byId("ways", 1, wayIds, Changeset.delta.ways(wayCh))
      byId("relations", 2, relIds, Changeset.delta.relations(relCh))

      // U2b/U3b — reverse adjacency. The buckets to rewrite are the
      // ones holding the changed parents' OLD member rows plus the NEW
      // member rows; the old member ids come from the changed parents'
      // own element rows (read partition-pruned from the pinned
      // version — O(changes), the reference's per-way reverse lookup
      // at `update.cpp:78-126`).
      def parentsOf(elemTable: String, keysTag: Int, elemIds: DataFrame)
      : Option[DataFrame] =
        bk.get(elemTable).map { elemSpec =>
          val parentBuckets = bucketsOfCached(keysTag, elemIds,
            elemSpec.key, elemSpec.nBuckets)
          VersionedTable.readBuckets(spark, root, elemTable,
            parentBuckets, Some(prev)).join(elemIds, Seq("id"))
        }
      def adjDelta(adjTable: String, oldParentRows: Option[DataFrame],
                   oldMembers: DataFrame => DataFrame,
                   newMembers: DataFrame,
                   transform: DataFrame => DataFrame): Unit =
        for (spec <- bk.get(adjTable); oldParents <- oldParentRows) {
          val memberIds = oldMembers(oldParents)
            .unionByName(newMembers).distinct()
          deltas += adjTable -> Delta(
            VersionedTable.bucketsOf(memberIds, spec.key, spec.nBuckets),
            transform)
        }

      adjDelta("node_way", parentsOf("ways", 1, wayIds),
        old => old.select(explode(col("nodes")).as("member_id")),
        wayCh.where(col("visible"))
          .select(explode(col("nodes")).as("member_id")),
        Changeset.delta.nodeWay(wayCh))
      def relMembers(df: DataFrame, mtype: String): DataFrame = df
        .select(explode(col("members")).as("m"))
        .where(col("m.mtype") === mtype)
        .select(col("m.ref").as("member_id"))
      // the changed relations' old rows are identical for all three
      // member types: read the pruned buckets ONCE and cache across
      // the three adjacency deltas (the bucketsOf actions inside
      // adjDelta materialize eagerly, so the unpersist below is safe)
      val relParents = parentsOf("relations", 2, relIds).map(
        _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      for (mtype <- Seq("node", "way", "relation"))
        adjDelta(s"${mtype}_relation", relParents,
          old => relMembers(old, mtype),
          relMembers(relCh.where(col("visible")), mtype),
          Changeset.delta.relAdj(relCh, mtype))
      relParents.foreach(_.unpersist(blocking = false))

      val maxSeq = changes.agg(max("seqnum")).head().getLong(0)
      VersionedTable.commitDelta(spark, root, deltas.toMap, Map(
        SeqKey -> maxSeq.toString,
        BatchIdKey -> batchId.toString) ++ extraMeta, dryRun = dryRun)
      ApplyResult.Applied
    } finally { changes.unpersist(blocking = false); () }
  }
}
