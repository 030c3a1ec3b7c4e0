package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the remaining Structured
  * Streaming operator family next to windowed aggs (q114), session
  * windows (q115) and the custom-state trio (q104/q105/q130): two
  * unbounded streams joined on an equality key plus an event-time
  * band, with watermarks bounding BOTH sides' join state.
  *
  * Semantics (attribution shape): purchases join the same user's
  * clicks from the preceding hour — `c_ts ∈ [p_ts - 1h, p_ts)`.
  * Spark derives each side's state retention from the time bounds:
  * a click can be dropped once the purchase-side watermark passes
  * `c_ts + 1h` (no future purchase can reach back to it), a purchase
  * once the click-side watermark passes `p_ts` — so state is bounded
  * by (rate x band), never by stream length. Inner joins emit each
  * match as soon as both rows exist; under a time-ordered replay the
  * result set provably equals the batch interval join (a row is only
  * evicted when its entire match band is below the other side's
  * watermark, and ordered arrival means that band has fully arrived).
  *
  * Scale (100 TB/day): both sides hash-partition on user_id (one
  * co-keyed exchange each), per-key state holds only rows inside the
  * live band, and the watermark delay is the knob trading late-data
  * tolerance for state size.
  */
object StreamingJoin {

  /** Matched (purchase, click) pairs: same user, click in the hour
    * before the purchase. Both inputs must already carry watermarks. */
  def purchaseClickPairs(purchases: DataFrame, clicks: DataFrame)
  : DataFrame =
    purchases.join(clicks, expr(
        "c_user = p_user AND " +
          "c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"))
      .select(col("p_id"), col("c_id"))
}
