package graft.ops

/** Byte-budget for the adaptive driver-side paths ([[Closure]],
  * [[Components]]): how many collected edge rows fit in a small,
  * fixed fraction of the driver heap.
  *
  * The old guard was a flat 4M-row limit — right order of magnitude at
  * planet cardinalities (relation_relation ≈ 497K) but blind to the
  * actual driver size: a 2 GiB driver and a 64 GiB driver got the same
  * threshold. Deriving the row budget from `Runtime.maxMemory` keeps
  * the take()-probe-then-fallback shape while making the decision
  * honest about what the collect actually costs.
  */
object DriverBudget {

  /** Estimated heap bytes per COLLECTED edge row: 16 B of payload (two
    * longs) plus Row/boxing/array overhead — ~96 B measured on JDK 17
    * with compressed oops; 128 is the conservative planning figure. */
  val EdgeRowBytes: Long = 128L

  /** Fraction of driver max heap one adaptive collect may claim. Small
    * on purpose: the driver path is an optimization, and spilling into
    * GC pressure would cost more than the distributed loop saves. */
  val HeapFraction: Double = 0.05

  /** Max edge rows the adaptive paths may collect on THIS driver
    * (5% of max heap at 128 B/row: 16 GiB -> ~6.7M rows, 2 GiB ->
    * ~840K). Deterministic per JVM; pass an explicit limit (or 0 to
    * force the distributed loop) where tests need to pin the branch. */
  def edgeRowBudget(maxHeapBytes: Long = Runtime.getRuntime.maxMemory())
  : Long = ((maxHeapBytes * HeapFraction) / EdgeRowBytes).toLong

  /** TIME-honest ceiling on the driver edge collect, independent of
    * heap: a 16 GiB driver FITS ~6.7M boxed rows in 5% of heap, but a
    * multi-million-row `take()` + single-threaded union-find is a
    * latency cost memory budgets can't see (round-7 q57 regressed
    * 9.6s -> 33.7s exactly this way). 500K edges union-find in
    * ~tens of ms with the primitive-array implementation; above that
    * the distributed large-star/small-star loop amortizes better. */
  val EdgeRowTimeCap: Long = 500000L

  /** Effective driver-collect limit: memory-honest AND time-honest. */
  def edgeCollectLimit(): Long = math.min(edgeRowBudget(), EdgeRowTimeCap)
}
