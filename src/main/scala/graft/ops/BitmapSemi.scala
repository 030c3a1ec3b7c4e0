package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{call_function, col, lit}

/** Broadcast-bitmap semi-join: the Spark rendering of the reference's
  * Roaring-bitmap ID-set filters (`src/extract.cpp:149-151` — every
  * extract stage accumulates IDs into a bitmap, then later stages test
  * membership against it).
  *
  * `big WHERE key IN (ids)` normally plans as a `left_semi` join —
  * broadcast-hash at best (a boxed-Long hash set per executor), a full
  * shuffle of `big` at worst. When `ids` is small enough to bitmap
  * (OSM seed sets are dense integers — millions of IDs compress to a
  * few MB), this instead:
  *
  *   1. aggregates `ids` into one canonical compressed bitmap
  *      (map-side partial bitmaps merge on a single-row shuffle);
  *   2. inlines it as a foldable literal, so
  *      [[graft.functions.BitmapContains]] parses it once per plan and
  *      whole-stage codegen probes it with two binary searches per row
  *      — `big` is filtered map-side with ZERO shuffle and no
  *      per-executor hash-set build.
  *
  * If the bitmap exceeds `maxBytes` (default 32 MiB — planet-scale
  * way/relation seed sets stay far under this; ~270M dense IDs fit) the
  * helper falls back to the plain `left_semi` join rather than ship an
  * oversized plan, mirroring the size-gated broadcast rule in
  * [[graft.llm.Dedup]].
  */
object BitmapSemi {

  /** Rows of `big` whose `key` appears in `ids.idCol`. */
  def filterIn(big: DataFrame, key: Column, ids: DataFrame, idCol: String,
               maxBytes: Int = 32 << 20): DataFrame = {
    val bytes = ids
      .agg(call_function("bitmap_agg", col(idCol).cast("long")))
      .head().getAs[Array[Byte]](0)
    if (bytes.length <= maxBytes)
      big.where(call_function("bitmap_contains", lit(bytes),
        key.cast("long")))
    else
      big.join(ids.select(col(idCol).cast("long").as("__bs_id")).distinct(),
        key.cast("long") === col("__bs_id"), "left_semi")
  }
}
