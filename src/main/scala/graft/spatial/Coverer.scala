package graft.spatial

import scala.collection.mutable

/** S2 region coverer: approximates a [[Region]] by at most `maxCells`
  * cells of level at most `maxLevel`, mirroring the reference's planner
  * (`src/extract.cpp:132-136`: S2RegionCoverer with max_cells=1024,
  * max_level=16) re-derived on top of this repo's own S2 cell math.
  *
  * Guarantees (the ones spatial pruning correctness rests on):
  *   - CONSERVATIVE: the union of returned cells covers every point the
  *     region contains (cells are only dropped when a padded rect bound
  *     of the cell provably misses the region);
  *   - |result| <= maxCells, every cell level <= maxLevel;
  *   - deterministic for a given region (BFS order, no randomness).
  *
  * The covering is approximate-by-design exactly like the reference
  * (`docs/MANUAL.md:144-148`): callers needing exact results apply a
  * residual point-in-region predicate after the range scan.
  */
object Coverer {

  // the two pole leaf cells are constants — probed once, not per rect
  private val northLeaf = S2.latLngToLeaf(90.0, 0.0)
  private val southLeaf = S2.latLngToLeaf(-90.0, 0.0)

  /** Conservative lat/lng rect of a cell: corners + edge midpoints,
    * padded by a fraction of the cell size (great-circle edges bulge
    * relative to lat/lng interpolation), pole-aware, antimeridian-aware.
    * Returns (latLo, latHi, lngLo, lngHi); lngLo > lngHi encodes a
    * wrapped interval.
    */
  def cellRect(id: Long): (Double, Double, Double, Double) = {
    val lvl = S2.level(id)
    // sample each edge at `k` subdivisions in (i,j) space (denser for
    // coarse cells, whose great-circle edges bow far from the chord)
    val k = if (lvl <= 2) 8 else if (lvl <= 6) 4 else 2
    val (face, i, j) = S2.toFaceIJ(id)
    val sizeIJ = 1 << (S2.MaxLevel - lvl)
    val i0 = (i & -sizeIJ).toLong
    val j0 = (j & -sizeIJ).toLong
    val m = (1 << S2.MaxLevel).toDouble
    val pts = (0 until 4 * k).map { t =>
      val frac = (t % k).toDouble / k
      val (ii, jj) = (t / k) match {
        case 0 => (i0 + sizeIJ * frac, j0.toDouble)
        case 1 => (i0 + sizeIJ.toDouble, j0 + sizeIJ * frac)
        case 2 => (i0 + sizeIJ * (1 - frac), j0 + sizeIJ.toDouble)
        case _ => (i0.toDouble, j0 + sizeIJ * (1 - frac))
      }
      val (x, y, z) = S2.faceUvToXyz(face, S2.stToUv(ii / m),
        S2.stToUv(jj / m))
      S2.xyzToLatLng(x, y, z)
    }.toArray
    val lats = pts.map(_._1)
    // pole membership is exact via leaf-range containment
    val hasNorth = S2.rangeMin(id) <= northLeaf && northLeaf <= S2.rangeMax(id)
    val hasSouth = S2.rangeMin(id) <= southLeaf && southLeaf <= S2.rangeMax(id)
    // cell angular size in degrees (~90deg at level 0, halving per level);
    // pad generously covers the residual between the sampled polyline and
    // the true edge curve (sagitta ~ (size/k)^2, far below size/8)
    val sizeDeg = 90.0 / (1L << lvl)
    val pad = sizeDeg / 8.0 + 1e-9
    val latLo = if (hasSouth) -90.0 else math.max(-90.0, lats.min - pad)
    val latHi = if (hasNorth) 90.0 else math.min(90.0, lats.max + pad)
    if (hasNorth || hasSouth)
      return (latLo, latHi, -180.0, 180.0)
    // unwrap lngs around the first sample so antimeridian cells stay a
    // single contiguous interval
    val ref = pts.head._2
    val unwrapped = pts.map { case (_, l) =>
      var x = l
      while (x - ref > 180) x -= 360
      while (ref - x > 180) x += 360
      x
    }
    val lo = unwrapped.min - pad
    val hi = unwrapped.max + pad
    if (hi - lo >= 360.0) (latLo, latHi, -180.0, 180.0)
    else (latLo, latHi, SubRegion.normLng(lo), SubRegion.normLng(hi))
  }

  /** Compute the covering: BFS refinement from the 6 face cells. A cell
    * is dropped when its (padded) rect provably misses the region,
    * accepted when the region provably contains it or it reached
    * maxLevel, and split otherwise — children are rect-tested BEFORE
    * enqueueing so the budget counts only live frontier cells. */
  def covering(region: Region, maxCells: Int = 1024,
               maxLevel: Int = 16): Seq[Long] = {
    require(maxCells >= 6, "need at least the 6 face cells")
    val result = mutable.ArrayBuffer[Long]()
    // the rect travels WITH the cell: cellRect (8-32 trig-heavy edge
    // samples per call) is the BFS's dominant cost, and every enqueued
    // cell was already rect-tested as a child candidate — recomputing
    // on dequeue would double the planner's driver-side work
    val queue = mutable.Queue[(Long, (Double, Double, Double, Double))]()
    S2.faceCells.foreach { f =>
      val rect = cellRect(f)
      if (region.mayIntersect(rect)) queue.enqueue((f, rect))
    }
    while (queue.nonEmpty) {
      val (c, rect) = queue.dequeue()
      val lvl = S2.level(c)
      val accept = lvl == maxLevel || region.containsRect(rect)
      if (accept) result += c
      else {
        val kids = (0 until 4).map(k => S2.child(c, k))
          .map(k => (k, cellRect(k)))
          .filter(kr => region.mayIntersect(kr._2))
        // splitting replaces 1 frontier cell with up to 4: net +3 worst
        if (result.size + queue.size + kids.size > maxCells) result += c
        else kids.foreach(queue.enqueue)
      }
    }
    result.toSeq
  }

  /** G8: buffer a covering (`--expand LEVEL`, `src/extract.cpp:138-143`
    * = S2CellUnion::Expand): every covering cell contributes the 8
    * neighbors of its enclosing cell at `expandLevel` (or of itself if
    * already coarser), guaranteeing a buffer of at least one
    * level-`expandLevel` cell width around the original union — a
    * conservative superset of the reference's expansion. */
  def expandCovering(cells: Seq[Long], expandLevel: Int): Seq[Long] = {
    val extra = cells.flatMap { c =>
      val l = math.min(S2.level(c), expandLevel)
      val base = S2.parent(c, l)
      S2.neighbors(base) :+ base
    }
    normalize(cells ++ extra)
  }

  /** Drop cells nested inside another cell of the set (S2 cell ranges
    * are either nested or disjoint), so downstream range predicates stay
    * disjoint — required by the binary-search membership test. */
  def normalize(cells: Seq[Long]): Seq[Long] = {
    // ties on rangeMin = nested cells sharing their first leaf: put the
    // LARGEST (ancestor) first so descendants get dropped
    val sorted = cells.distinct
      .sortBy(c => (S2.rangeMin(c), S2.rangeMin(c) - S2.rangeMax(c)))
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var lastMax = Long.MinValue
    sorted.foreach { c =>
      // sorted by rangeMin and ranges are nested-or-disjoint, so a cell
      // is either inside the last kept one (rangeMax <= lastMax) or
      // fully past it
      if (out.isEmpty || S2.rangeMax(c) > lastMax) {
        out += c
        lastMax = S2.rangeMax(c)
      }
    }
    out.toSeq
  }

  /** Level-`level` leaf-range disjuncts [lo, hi] (inclusive) of a
    * covering — the scan predicate shape (`src/storage.cpp:171-172`'s
    * child_begin/child_end semantics). */
  def coveringRanges(region: Region, maxCells: Int = 1024,
                     maxLevel: Int = 16, level: Int = 16)
  : Seq[(Long, Long)] =
    // the covering must never go DEEPER than the range level: a
    // covering cell below `level` has no level-`level` children, so
    // childRangeAt would produce an inverted (lo > hi) disjunct that
    // silently matches nothing — clamping keeps the covering a
    // superset of the region at the scan's own granularity
    cellRanges(covering(region, maxCells, math.min(maxLevel, level)),
      level)

  /** Level-`level` range disjuncts of an EXPLICIT cell set (the
    * `--expand`ed covering path and any other caller that shapes its
    * own cells) — use this instead of hand-rolling
    * `childRangeAt + sortBy`, so the deeper-than-level inversion
    * hazard stays guarded in one place. */
  def cellRanges(cells: Seq[Long], level: Int = 16): Seq[(Long, Long)] = {
    require(cells.forall(S2.level(_) <= level),
      s"cell deeper than range level $level — inverted range")
    cells.map(c => S2.childRangeAt(c, level)).sortBy(_._1)
  }
}
