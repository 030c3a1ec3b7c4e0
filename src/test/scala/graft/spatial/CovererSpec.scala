package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Coverer + S2 cell-math properties: the invariants spatial pruning
  * correctness rests on. */
class CovererSpec extends AnyFunSuite {

  private def cellOfPoint(lat: Double, lng: Double, lvl: Int): Long =
    S2.latLngToCellId(lat, lng, lvl)

  test("S2: id level/parent/range invariants") {
    val rnd = new Random(1)
    for (_ <- 1 to 500) {
      val lat = rnd.nextDouble() * 180 - 90
      val lng = rnd.nextDouble() * 360 - 180
      val leaf = S2.latLngToLeaf(lat, lng)
      assert(S2.level(leaf) == 30)
      for (lvl <- Seq(0, 4, 10, 16)) {
        val p = S2.parent(leaf, lvl)
        assert(S2.level(p) == lvl)
        assert(S2.rangeMin(p) <= leaf && leaf <= S2.rangeMax(p))
        val (lo, hi) = S2.childRangeAt(p, 16)
        val l16 = S2.parent(leaf, 16)
        if (lvl <= 16) assert(lo <= l16 && l16 <= hi)
      }
    }
  }

  test("S2: children partition the parent's leaf range") {
    val id = S2.latLngToCellId(40.0, -74.0, 8)
    val kids = (0 until 4).map(S2.child(id, _))
    assert(kids.forall(k => S2.level(k) == 9))
    val ranges = kids.map(k => (S2.rangeMin(k), S2.rangeMax(k))).sorted
    assert(ranges.head._1 == S2.rangeMin(id))
    assert(ranges.last._2 == S2.rangeMax(id))
    ranges.sliding(2).foreach { case Seq(a, b) =>
      // leaf ids are odd integers (trailing lsb 1): adjacent sibling
      // ranges are spaced by 2, with no leaf id in between
      assert(a._2 + 2 == b._1)
    }
  }

  test("cellRect contains the points that map into the cell") {
    val rnd = new Random(7)
    for (_ <- 1 to 300) {
      val lat = rnd.nextDouble() * 170 - 85
      val lng = rnd.nextDouble() * 360 - 180
      for (lvl <- Seq(4, 8, 12, 16)) {
        val c = cellOfPoint(lat, lng, lvl)
        val (latLo, latHi, lngLo, lngHi) = Coverer.cellRect(c)
        assert(lat >= latLo - 1e-9 && lat <= latHi + 1e-9,
          s"lat $lat outside [$latLo,$latHi] lvl=$lvl")
        assert(SubRegion.lngIn(lng, lngLo, lngHi) ||
          SubRegion.lngIn(lng, lngLo - 1e-9, lngHi + 1e-9),
          s"lng $lng outside [$lngLo,$lngHi] lvl=$lvl")
      }
    }
  }

  /** THE covering guarantee: every contained point falls in some
    * covering cell's level-16 range. */
  private def checkCovering(region: Region, seed: Int): Unit = {
    val ranges = Coverer.coveringRanges(region)
    assert(ranges.nonEmpty)
    assert(ranges.size <= 1024)
    val (latLo, latHi, lngLo, lngHi) = region.bounds
    val rnd = new Random(seed)
    var checked = 0
    for (_ <- 1 to 3000) {
      val lat = latLo + rnd.nextDouble() * (latHi - latLo)
      val span = if (lngLo <= lngHi) lngHi - lngLo else 360 - (lngLo - lngHi)
      val lng = SubRegion.normLng(lngLo + rnd.nextDouble() * span)
      if (region.contains(lat, lng)) {
        checked += 1
        val l16 = cellOfPoint(lat, lng, 16)
        assert(ranges.exists { case (lo, hi) => lo <= l16 && l16 <= hi },
          s"point ($lat,$lng) in region but not covered")
      }
    }
    assert(checked > 50, s"too few interior samples ($checked) — bad test")
  }

  test("covering covers a bbox region") {
    checkCovering(Region("40.70,-74.02,40.78,-73.90", "bbox"), 11)
  }

  test("covering covers a disc region") {
    checkCovering(Region("48.85,2.35,0.4", "disc"), 12)
  }

  test("covering covers a polygon with a hole") {
    val json =
      """{"type":"Polygon","coordinates":[
        |[[-74.2,40.5],[-74.2,41.0],[-73.6,41.0],[-73.6,40.5],[-74.2,40.5]],
        |[[-74.0,40.7],[-74.0,40.8],[-73.8,40.8],[-73.8,40.7],[-74.0,40.7]]]}"""
        .stripMargin
    checkCovering(Region(json, "geojson"), 13)
  }

  test("covering covers an antimeridian-crossing polygon") {
    val json =
      """{"type":"Polygon","coordinates":[[
        |[179.5,-1.0],[179.5,1.0],[180.5,1.0],[180.5,-1.0],[179.5,-1.0]]]}"""
        .stripMargin
    checkCovering(Region(json, "geojson"), 14)
  }

  test("neighbors: 8 same-level cells, mutual, face-wrapping") {
    val rnd = new Random(21)
    for (_ <- 1 to 100) {
      val lat = rnd.nextDouble() * 170 - 85
      val lng = rnd.nextDouble() * 360 - 180
      val c = S2.latLngToCellId(lat, lng, 10)
      val ns = S2.neighbors(c)
      assert(ns.size >= 7 && ns.size <= 8) // corner cells have 7
      assert(ns.forall(n => S2.level(n) == 10))
      assert(!ns.contains(c))
      // neighborhood is mutual for edge neighbors (spot check)
      assert(ns.exists(n => S2.neighbors(n).contains(c)))
    }
    // face boundary: a cell at lng ~ 180 still has 8 distinct neighbors
    val edge = S2.latLngToCellId(10.0, 179.999, 10)
    assert(S2.neighbors(edge).size == 8)
  }

  test("expandCovering buffers the region by about one cell (G8)") {
    val r = Region("40.70,-74.02,40.78,-73.90", "bbox")
    val cells = Coverer.covering(r)
    val expanded = Coverer.expandCovering(cells, 12)
    // superset of the original
    val origRanges = cells.map(c => (S2.rangeMin(c), S2.rangeMax(c)))
    val expRanges = expanded.map(c => (S2.rangeMin(c), S2.rangeMax(c)))
    def covered(rs: Seq[(Long, Long)], leaf: Long) =
      rs.exists { case (lo, hi) => lo <= leaf && leaf <= hi }
    val rnd = new Random(31)
    for (_ <- 1 to 500) {
      val lat = 40.70 + rnd.nextDouble() * 0.08
      val lng = -74.02 + rnd.nextDouble() * 0.12
      val leaf = S2.latLngToLeaf(lat, lng)
      if (covered(origRanges, leaf)) assert(covered(expRanges, leaf))
    }
    // a point just outside the bbox (within one level-12 cell ~ 2km)
    val justOutside = S2.latLngToLeaf(40.785, -73.96)
    assert(covered(expRanges, justOutside),
      "expanded covering must include the one-cell buffer")
    // normalized: ranges disjoint
    val sorted = expRanges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1)
      case _ =>
    }
  }

  test("coveringRanges at a coarse range level never inverts (lo <= hi) " +
    "and still covers the region") {
    // a covering cell DEEPER than the range level used to produce
    // lo > hi disjuncts that silently matched nothing — the covering
    // must be clamped to the scan's own granularity
    val region = Region("40.70,-74.02,40.78,-73.90", "bbox")
    for (level <- Seq(8, 10, 12)) {
      val ranges = Coverer.coveringRanges(region, level = level)
      assert(ranges.nonEmpty)
      ranges.foreach { case (lo, hi) =>
        assert(lo <= hi, s"inverted range at level $level: ($lo, $hi)")
      }
      // an interior point's level-`level` cell falls in some disjunct
      val leaf = S2.latLngToCellId(40.74, -73.98, level)
      assert(ranges.exists { case (lo, hi) => lo <= leaf && leaf <= hi },
        s"interior cell not covered at level $level")
    }
  }

  test("covering respects maxCells and maxLevel") {
    val r = Region("40.70,-74.02,40.78,-73.90", "bbox")
    for (budget <- Seq(6, 16, 64, 1024)) {
      val cells = Coverer.covering(r, maxCells = budget)
      assert(cells.size <= budget, s"budget $budget exceeded: ${cells.size}")
      assert(cells.forall(c => S2.level(c) <= 16))
    }
  }

  test("covering prunes: a small region yields small total range span") {
    // the whole-sphere level-16 id space spans 6 * 2^61 leaf ids; a
    // ~10km bbox covering must span a vanishing fraction of it
    val r = Region("40.70,-74.02,40.78,-73.90", "bbox")
    val ranges = Coverer.coveringRanges(r)
    val span = ranges.map { case (lo, hi) =>
      BigInt(hi) - BigInt(lo) + 1
    }.sum
    val total = BigInt(6) * (BigInt(1) << 61)
    assert(span * 100000 < total, s"covering too coarse: $span of $total")
  }
}
