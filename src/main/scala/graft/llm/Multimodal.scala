package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque BINARY
  * columns plus typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[decodeStub]] derives deterministic fake features from the bytes so
  * the Spark-side plumbing — schema, batch shape, partitioning, typed
  * mapPartitions signature — is real and testable. A production build
  * swaps `decodeStub` for a JNI/FFI codec call; nothing else changes.
  *
  * Scale design (100 TB):
  *   - binaries stay columnar (Parquet BINARY) and are NEVER collected;
  *   - feature extraction is mapPartitions (one codec init per partition,
  *     not per row — the expensive part of real decoders);
  *   - `spark.sql.files.maxPartitionBytes` governs batch size; assets
  *     should be written with a row-group size that keeps a partition's
  *     binaries within executor memory (~128 MB default is fine for
  *     thumbnails; shard large videos into chunked rows).
  */
object Multimodal {

  /** Typed asset row: media bytes + minimal metadata. */
  final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)

  /** Extracted feature row (stub: byte-derived). */
  final case class AssetFeatures(asset_id: Long, kind: String,
                                 n_bytes: Long, content_hash: String,
                                 feature: Array[Double])

  /** Deterministic fake "decode": 8 doubles derived from evenly-spaced
    * byte probes. STUB for a real image/audio decoder (no codecs in this
    * environment); deterministic so tests and re-runs agree. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length
    if (n == 0) Array.fill(8)(0.0)
    else Array.tabulate(8) { i =>
      val probe = bytes(math.min(n - 1, i * n / 8)) & 0xff
      probe / 255.0
    }
  }

  /** Build an asset table from any DataFrame with an id and a binary
    * column (here: documents' text bytes stand in for media bytes). */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      // deterministic fake modality assignment
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      (col("doc_id") * 40 + 1000).as("duration_ms"))

  /** Batched feature extraction: typed mapPartitions so a real codec
    * initializes once per partition. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init would happen here (codec handles, buffers)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        md.reset()
        val hash = md.digest(a.bytes).map("%02x".format(_)).mkString
        AssetFeatures(a.asset_id, a.kind, a.bytes.length.toLong, hash,
          decodeStub(a.bytes))
      }
    }
  }

  /** Deterministic "resize" STUB: sample the source binary at
    * `outW*outH` evenly spaced byte offsets and emit the sampled bytes
    * as the resized payload (nearest-neighbor over the byte grid — a
    * real build swaps the sampler for a codec scale call; the
    * Spark-side shape is what matters: one native codegen'd gather
    * over BINARY, no UDF, no collect, linear in output size).
    * Requires [[graft.functions.GraftFunctions.register]] on the
    * session (idempotent; every query entry point does it). */
  def resizeStub(bytes: org.apache.spark.sql.Column, outW: Int,
                 outH: Int): org.apache.spark.sql.Column =
    call_function("binary_resample", bytes, lit(outW * outH))

  /** Deterministic frame sampling: n evenly spaced `frameLen`-byte chunks
    * ("frames") sliced out of the binary — pure Column ops, no UDF
    * (Substring supports BinaryType natively). */
  def frameSample(bytes: org.apache.spark.sql.Column, n: Int,
                  frameLen: Int = 16): org.apache.spark.sql.Column = {
    val len = octet_length(bytes).cast("long")
    transform(sequence(lit(0), lit(n - 1)), i => {
      val off = (floor(i.cast("double") * len.cast("double") / n)
        .cast("int") + 1)
      bytes.substr(off, lit(frameLen))
    })
  }
}
