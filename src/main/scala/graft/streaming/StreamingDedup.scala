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
