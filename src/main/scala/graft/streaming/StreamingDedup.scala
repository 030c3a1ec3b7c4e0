package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** (fingerprint, id) pair flowing into the streaming dedup. */
final case class FpDoc(fingerprint: String, doc_id: Long)

/** First-seen winner for one fingerprint. */
final case class Kept(fingerprint: String, keep_id: Long)

/** Streaming exact deduplication: keep the FIRST document seen per
  * content fingerprint across ALL micro-batches of an unbounded corpus
  * feed — the continuous-ingest counterpart of [[graft.llm.Dedup
  * .exactDedup]] (same md5 normalization, so batch and streaming
  * agree on what "same content" means).
  *
  * Mechanics: `groupByKey(fingerprint)` +
  * `flatMapGroupsWithState(Append, NoTimeout)`. Per-key state is ONE
  * long (the winning id) in Spark's checkpointed state store, so a
  * restart resumes with the full seen-set intact (exactly-once
  * emission of keepers). Within a micro-batch the min id wins —
  * deterministic under any partitioning.
  *
  * Scale notes (100 TB design): state is hash-partitioned by
  * fingerprint across executors, O(distinct contents) entries of ~40
  * bytes — the same cardinality the batch dedup shuffles, just
  * resident. No timeout is set because dedup state must be permanent
  * (a duplicate a month later is still a duplicate); pipelines that
  * only need windowed dedup can add a timeout without changing the
  * operator. The OSM replication side ([[Replication]]) keeps its own
  * idempotence story; this operator is the curation-side equivalent.
  */
/** One (band, bucket) membership row flowing into streaming LSH. */
final case class BandDoc(doc_id: Long, band: Int, bkey: String)

/** Candidate near-dup pair surfaced by band `band` (a < b). */
final case class CandidatePair(a: Long, b: Long, band: Int)

/** Streaming MinHash/LSH near-duplicate candidate detection: as
  * documents arrive, each joins its `bands` LSH buckets; a bucket that
  * already holds earlier documents emits candidate pairs (new vs each
  * earlier member) immediately — continuous dedup against the entire
  * history without re-scanning it.
  *
  * Same signature/band math as the batch path ([[graft.llm.Dedup
  * .minhashCandidatePairs]]), so batch and streaming agree on what
  * collides. Differences, by streaming necessity:
  *   - a pair colliding in k bands is emitted up to k times (the batch
  *     path's first-band dedup needs cross-band visibility; stream
  *     consumers `dropDuplicates("a","b")` per batch or verify
  *     idempotently);
  *   - per-bucket state is capped at `maxBucket` ids: a pathological
  *     bucket stops ADMITTING new members past the cap. Under an
  *     id-ordered feed the admitted prefix equals the batch path's
  *     smallest-id truncation ([[graft.llm.Dedup.minhashCandidatePairs]]),
  *     so capped batch and capped streaming admit the SAME members;
  *     the residual difference is pair-level (first-band vs any-band
  *     emission when bucket crowding differs across bands — pinned in
  *     StreamingSpec). Under arbitrary arrival order the prefix is
  *     arrival-order, the documented streaming semantics.
  *
  * Scale: state is hash-partitioned by (band, bkey); per-key state is
  * <= maxBucket longs. Checkpointing makes the seen-set durable, so a
  * restart resumes mid-corpus without re-emitting old pairs.
  */
object StreamingNearDup {

  def candidatePairs(docs: DataFrame, textCol: String, idCol: String,
                     bands: Int = 4, rowsPerBand: Int = 4,
                     maxBucket: Int = 1000): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val n = bands * rowsPerBand
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.llm.TextFunctions.minhashSignature(col(textCol), n)
          .as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id"), posexplode(
        graft.llm.TextFunctions.lshBands(col("sig"), bands, rowsPerBand)))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("bkey"))
      .as[BandDoc]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[BandDoc],
         st: org.apache.spark.sql.streaming.GroupState[Seq[Long]]) =>
          val prev = st.getOption.getOrElse(Seq.empty)
          // O(1) membership: prev is a Seq for the state encoder, but
          // a linear `prev.contains` per fresh id is O(m^2) per batch
          // on a dense bucket
          val prevSet = prev.toSet
          // deterministic in-batch order; skip ids already in state
          // (redelivered batches emit nothing new)
          val fresh = rows.map(_.doc_id).toSeq.distinct.sorted
            .filterNot(prevSet)
          // prefix-wise cap: admit only up to maxBucket members total
          val admitted = fresh.take(math.max(0, maxBucket - prev.size))
          if (admitted.nonEmpty) st.update(prev ++ admitted)
          // LAZY pair stream: a dense bucket of m members emits C(m,2)
          // pairs — materializing them per group (the old Seq builder)
          // is O(m^2) heap PER TASK and OOMs on pathological buckets
          // exactly when the cap is raised for oracle fidelity (q105).
          // The iterator keeps per-task memory O(m); state was already
          // updated above, before consumption.
          admitted.iterator.zipWithIndex.flatMap { case (id, k) =>
            (prev.iterator ++ admitted.iterator.take(k)).map(p =>
              CandidatePair(math.min(p, id), math.max(p, id), key._1))
          }
      }
  }
}

object StreamingDedup {

  /** Keeper stream: emits one (fingerprint, keep_id) row the first
    * time a content fingerprint is seen; later duplicates emit
    * nothing. Works identically over a batch DataFrame (state is
    * per-query there, giving plain exact dedup). */
  def keepers(docs: DataFrame, textCol: String, idCol: String)
  : Dataset[Kept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(graft.llm.TextFunctions.fingerprint(col(textCol))
          .as("fingerprint"),
        col(idCol).cast("long").as("doc_id"))
      .as[FpDoc]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[FpDoc],
         st: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val minId = rows.map(_.doc_id).min
          if (st.exists) Iterator.empty
          else {
            st.update(minId)
            Iterator(Kept(fp, minId))
          }
      }
  }
}
