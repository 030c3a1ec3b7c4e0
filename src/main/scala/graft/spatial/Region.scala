package graft.spatial

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, Polygon => JtsPolygon}
import org.locationtech.jts.algorithm.locate.SimplePointInAreaLocator
import org.locationtech.jts.geom.Location

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Spatial region: the query-side object of `osmx extract`.
  *
  * Reimplements the reference's `src/region.cpp` semantics (pinned by
  * `test/test_region.cpp`):
  *   - 4 input formats: bbox "minLat,minLon,maxLat,maxLon" (lat-first,
  *     opposite of GeoJSON), disc "lat,lon,radiusDeg", osmosis `.poly`
  *     (lon lat pairs, scientific notation, optional repeated last point,
  *     multiple named outer loops — each loop an independent OR-region,
  *     `src/region.cpp:47-70`), GeoJSON Polygon/MultiPolygon/
  *     GeometryCollection/Feature/FeatureCollection (`src/region.cpp:101-115`);
  *   - coordinates are normalized like S2LatLng::Normalized (lat clamped
  *     to ±90, lng wrapped to ±180), so lon 181 becomes -179;
  *   - `contains` is the OR over member regions (`src/region.cpp:122-127`);
  *     polygon membership is even-odd over rings (S2Polygon nested-loop
  *     semantics after loop normalization) and boundary-exclusive (the
  *     reference's multiple-outer-loops test requires !Contains at a
  *     vertex);
  *   - `bounds` mimics the reference's NAIVE endpoint min/max across
  *     member bounds (`src/region.cpp:137-157`), including wrapped lng
  *     intervals for antimeridian-crossing loops.
  *
  * Containment math is planar in lat/lng space with ±360 lng unwrapping
  * (adequate at OSM region scales; the reference's own extracts are
  * cell-approximate by design, `docs/MANUAL.md:144-148`).
  */
sealed trait SubRegion {
  /** point membership, boundary-exclusive for polygons */
  def contains(latDeg: Double, lngDeg: Double): Boolean
  /** (latLo, latHi, lngLo, lngHi); lngLo > lngHi encodes a wrapped
    * (antimeridian-crossing) interval */
  def bound: (Double, Double, Double, Double)
  /** conservative: false only if the cell rect surely misses the region */
  def mayIntersect(rect: (Double, Double, Double, Double)): Boolean
  /** conservative: true only if the cell rect is surely inside */
  def containsRect(rect: (Double, Double, Double, Double)): Boolean
}

object SubRegion {
  /** S2LatLng::Normalized semantics. */
  def normLat(lat: Double): Double = math.max(-90.0, math.min(90.0, lat))
  def normLng(lng: Double): Double = {
    var l = lng % 360.0
    if (l > 180.0) l -= 360.0
    if (l < -180.0) l += 360.0
    l
  }

  private[spatial] def lngIn(lng: Double, lo: Double, hi: Double): Boolean =
    if (lo <= hi) lng >= lo && lng <= hi
    else lng >= lo || lng <= hi // wrapped interval

  private[spatial] def lngIntervalsIntersect(aLo: Double, aHi: Double,
                                             bLo: Double, bHi: Double)
  : Boolean =
    lngIn(bLo, aLo, aHi) || lngIn(bHi, aLo, aHi) ||
      lngIn(aLo, bLo, bHi) || lngIn(aHi, bLo, bHi)

  /** Smallest circular lng interval containing all values. */
  private[spatial] def lngSpan(lngs: Seq[Double]): (Double, Double) = {
    val distinct = lngs.distinct.sorted
    if (distinct.size == 1) return (distinct.head, distinct.head)
    // find largest gap going eastward; interval is its complement
    var maxGap = -1.0; var gapEndIdx = 0
    for (k <- distinct.indices) {
      val a = distinct(k)
      val b = if (k == distinct.size - 1) distinct.head + 360 else distinct(k + 1)
      val gap = b - a
      if (gap > maxGap) { maxGap = gap; gapEndIdx = (k + 1) % distinct.size }
    }
    val lo = distinct(gapEndIdx)
    val hi = distinct((gapEndIdx + distinct.size - 1) % distinct.size)
    (lo, hi)
  }
}

final case class BboxRegion(latLo: Double, lngLo: Double,
                            latHi: Double, lngHi: Double) extends SubRegion {
  import SubRegion._
  def contains(lat: Double, lng: Double): Boolean =
    lat >= latLo && lat <= latHi && lngIn(lng, lngLo, lngHi)
  def bound: (Double, Double, Double, Double) = (latLo, latHi, lngLo, lngHi)
  def mayIntersect(r: (Double, Double, Double, Double)): Boolean =
    r._2 >= latLo && r._1 <= latHi &&
      lngIntervalsIntersect(lngLo, lngHi, r._3, r._4)
  def containsRect(r: (Double, Double, Double, Double)): Boolean =
    r._1 >= latLo && r._2 <= latHi && r._3 <= r._4 && lngLo <= lngHi &&
      r._3 >= lngLo && r._4 <= lngHi
}

final case class DiscRegion(lat: Double, lng: Double, radiusDeg: Double)
  extends SubRegion {
  import SubRegion._
  private val axis = S2.latLngToXyz(lat, lng)

  /** great-circle angular distance in degrees */
  private def dist(pLat: Double, pLng: Double): Double = {
    val (x, y, z) = S2.latLngToXyz(pLat, pLng)
    val dot = math.max(-1.0, math.min(1.0,
      axis._1 * x + axis._2 * y + axis._3 * z))
    math.toDegrees(math.acos(dot))
  }

  def contains(pLat: Double, pLng: Double): Boolean =
    dist(pLat, pLng) <= radiusDeg

  def bound: (Double, Double, Double, Double) = {
    val lo = math.max(-90.0, lat - radiusDeg)
    val hi = math.min(90.0, lat + radiusDeg)
    if (lo <= -90 + 1e-12 || hi >= 90 - 1e-12 ||
      math.cos(math.toRadians(math.max(math.abs(lo), math.abs(hi)))) < 1e-9)
      (lo, hi, -180.0, 180.0)
    else {
      val sinR = math.sin(math.toRadians(radiusDeg))
      val cosLat = math.cos(math.toRadians(lat))
      val margin = math.toDegrees(math.asin(
        math.min(1.0, sinR / cosLat)))
      (lo, hi, normLng(lng - margin), normLng(lng + margin))
    }
  }

  def mayIntersect(r: (Double, Double, Double, Double)): Boolean = {
    val b = bound
    r._2 >= b._1 && r._1 <= b._2 &&
      lngIntervalsIntersect(b._3, b._4, r._3, r._4)
  }

  /** True only if the whole rect is surely inside the disc. The farthest
    * point of a lat/lng rect from the disc axis is a corner OR an interior
    * point of a constant-LATITUDE edge (parallels are not geodesics; on a
    * fixed parallel the distance is maximized at the lng in the interval
    * circularly farthest from the axis lng). Constant-lng edges are
    * meridian (great-circle) arcs, where distance over the lat interval is
    * extremized only at endpoints — so corners + per-lat-edge farthest-lng
    * points are exhaustive. No magic tolerance (r2 verdict item 4). */
  def containsRect(r: (Double, Double, Double, Double)): Boolean = {
    if (r._3 > r._4) return false
    // circularly-farthest lng from `lng` within [lo, hi]
    def farLng(lo: Double, hi: Double): Double = {
      val anti = SubRegion.normLng(lng + 180.0)
      if (SubRegion.lngIn(anti, lo, hi)) anti
      else {
        def delta(l: Double): Double = {
          val d = math.abs(SubRegion.normLng(l - lng)); d
        }
        if (delta(lo) >= delta(hi)) lo else hi
      }
    }
    val candidates =
      Seq((r._1, r._3), (r._1, r._4), (r._2, r._3), (r._2, r._4),
        (r._1, farLng(r._3, r._4)), (r._2, farLng(r._3, r._4)))
    candidates.forall { case (a, o) => dist(a, o) <= radiusDeg }
  }
}

/** One even-odd polygon: rings as (lng-unwrapped) coordinate arrays.
  * A GeoJSON Polygon (outer + holes) is ONE PolyRegion; a `.poly` loop or
  * one MultiPolygon member polygon is also one PolyRegion. */
final case class PolyRegion(rings: Seq[Array[(Double, Double)]] /* (lng,lat) */)
  extends SubRegion {
  import SubRegion._

  private val gf = new GeometryFactory()

  /** rings with lngs unwrapped to a continuous strip (first vertex in
    * [-180,180], subsequent vertices within 180° of their predecessor). */
  private val unwrapped: Seq[Array[(Double, Double)]] = rings.map { ring =>
    var prev = Double.NaN
    ring.map { case (lng0, lat) =>
      val lng = if (prev.isNaN) lng0
      else {
        var l = lng0
        while (l - prev > 180) l -= 360
        while (prev - l > 180) l += 360
        l
      }
      prev = lng
      (lng, lat)
    }
  }

  private def ringPoly(ring: Array[(Double, Double)]): JtsPolygon = {
    val closed = if (ring.head == ring.last) ring else ring :+ ring.head
    gf.createPolygon(closed.map { case (x, y) => new Coordinate(x, y) })
  }

  private val ringPolys = unwrapped.map(ringPoly)

  /** even-odd, boundary-exclusive, with ±360 lng shifts */
  def contains(lat: Double, lng: Double): Boolean = {
    var inside = false
    for (shift <- Seq(0.0, 360.0, -360.0)) {
      val p = new Coordinate(lng + shift, lat)
      var parity = 0
      var onBoundary = false
      ringPolys.foreach { rp =>
        SimplePointInAreaLocator.locate(p, rp) match {
          case Location.INTERIOR => parity += 1
          case Location.BOUNDARY => onBoundary = true
          case _ =>
        }
      }
      if (!onBoundary && parity % 2 == 1) inside = true
    }
    inside
  }

  def bound: (Double, Double, Double, Double) = {
    val lats = rings.flatMap(_.map(_._2))
    val lngs = rings.flatMap(_.map(v => normLng(v._1)))
    val (lo, hi) = lngSpan(lngs)
    (lats.min, lats.max, lo, hi)
  }

  def mayIntersect(r: (Double, Double, Double, Double)): Boolean = {
    val b = bound
    if (!(r._2 >= b._1 && r._1 <= b._2 &&
      lngIntervalsIntersect(b._3, b._4, r._3, r._4))) return false
    if (r._3 > r._4) return true // wrapped cell rect: stay conservative
    // exact-ish: rect intersects any ring polygon (in any 360 shift)
    (-1 to 1).exists { s =>
      val rect = gf.createPolygon(Array(
        new Coordinate(r._3 + 360.0 * s, r._1),
        new Coordinate(r._4 + 360.0 * s, r._1),
        new Coordinate(r._4 + 360.0 * s, r._2),
        new Coordinate(r._3 + 360.0 * s, r._2),
        new Coordinate(r._3 + 360.0 * s, r._1)))
      ringPolys.exists(rp => rp.intersects(rect))
    }
  }

  /** True only if the rect is surely inside the polygon. Requires: all 4
    * corners strictly interior (even-odd parity), no ring edge crossing
    * the rect boundary, AND no ring lying entirely inside the rect — a
    * hole ring fully inside the rect passes the first two checks while
    * carving the interior out (r2 verdict item 3). */
  def containsRect(r: (Double, Double, Double, Double)): Boolean = {
    if (r._3 > r._4) return false
    (-1 to 1).exists { s =>
      val corners = Array(
        new Coordinate(r._3 + 360.0 * s, r._1),
        new Coordinate(r._4 + 360.0 * s, r._1),
        new Coordinate(r._4 + 360.0 * s, r._2),
        new Coordinate(r._3 + 360.0 * s, r._2))
      val rect = gf.createPolygon(corners :+ corners.head)
      corners.forall(c => {
        var parity = 0
        ringPolys.foreach { rp =>
          if (SimplePointInAreaLocator.locate(c, rp) == Location.INTERIOR)
            parity += 1
        }
        parity % 2 == 1
      }) && !ringPolys.exists(rp =>
        rp.getExteriorRing.intersects(rect.getExteriorRing)) &&
        !ringPolys.exists(rp => rect.contains(rp.getExteriorRing))
    }
  }
}

final class Region(val members: Seq[SubRegion]) {

  /** OR over member regions (`src/region.cpp:122-127`). */
  def contains(latDeg: Double, lngDeg: Double): Boolean =
    members.exists(_.contains(latDeg, lngDeg))

  /** Naive endpoint min/max across member bounds, mimicking
    * `src/region.cpp:137-157` (NOT a proper circular-interval union). */
  def bounds: (Double, Double, Double, Double) = {
    val bs = members.map(_.bound)
    (bs.map(_._1).min, bs.map(_._2).max, bs.map(_._3).min, bs.map(_._4).max)
  }

  /** True when any member's longitude interval wraps the antimeridian
    * (lngLo > lngHi as a circular interval) — the case where a flat
    * min/max bbox is meaningless and the reference omits the output
    * header bbox (`src/extract.cpp:292-294`). */
  def crossesAntimeridian: Boolean =
    members.exists { m => val b = m.bound; b._3 > b._4 }

  def mayIntersect(rect: (Double, Double, Double, Double)): Boolean =
    members.exists(_.mayIntersect(rect))

  def containsRect(rect: (Double, Double, Double, Double)): Boolean =
    members.exists(_.containsRect(rect))
}

object Region {

  /** Parse a region from text + format tag, like the reference's
    * `Region(text, ext)` (`src/region.cpp:72-120`). */
  def apply(text: String, ext: String): Region = ext match {
    case "bbox" =>
      val Array(minLat, minLon, maxLat, maxLon) =
        text.trim.split(",").map(_.trim.toDouble)
      new Region(Seq(BboxRegion(
        SubRegion.normLat(minLat), SubRegion.normLng(minLon),
        SubRegion.normLat(maxLat), SubRegion.normLng(maxLon))))
    case "disc" =>
      val Array(lat, lon, r) = text.trim.split(",").map(_.trim.toDouble)
      new Region(Seq(DiscRegion(
        SubRegion.normLat(lat), SubRegion.normLng(lon), r)))
    case "poly" => parsePoly(text)
    case "geojson" => parseGeoJson(text)
    case other =>
      throw new IllegalArgumentException(s"Unknown region format: $other")
  }

  /** Osmosis .poly: first line is a name; then named loops of
    * "lon lat" lines, each ended by END; file ended by END. Each loop is
    * an independent OR-region (`src/region.cpp:85-100`): holes are NOT
    * interpreted (matches the reference's empty hole test). */
  private def parsePoly(text: String): Region = {
    val lines = text.linesIterator.toArray.map(_.replaceAll("\\s+$", ""))
    val loops = ArrayBuffer[PolyRegion]()
    var i = 1 // skip name line
    while (i < lines.length) {
      val header = lines(i).trim
      i += 1
      if (header != "END" && header.nonEmpty) {
        val pts = ArrayBuffer[(Double, Double)]()
        var done = false
        while (i < lines.length && !done) {
          val l = lines(i).trim
          i += 1
          if (l == "END") done = true
          else if (l.nonEmpty) {
            val parts = l.split("\\s+")
            val lng = SubRegion.normLng(parts(0).toDouble)
            val lat = SubRegion.normLat(parts(1).toDouble)
            pts += ((lng, lat))
          }
        }
        // drop repeated closing point (`src/region.cpp:65`)
        val ring = if (pts.size > 1 && pts.head == pts.last)
          pts.dropRight(1).toArray else pts.toArray
        loops += PolyRegion(Seq(ring))
      }
    }
    new Region(loops.toSeq)
  }

  private val mapper = new ObjectMapper()

  private def ringOf(arr: JsonNode): Array[(Double, Double)] = {
    val pts = arr.elements().asScala.map { c =>
      (SubRegion.normLng(c.get(0).asDouble()),
        SubRegion.normLat(c.get(1).asDouble()))
    }.toArray
    // GeoJSON rings repeat the last point; drop it (`src/region.cpp:22`)
    if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
  }

  private def polygonOf(coords: JsonNode): PolyRegion =
    PolyRegion(coords.elements().asScala.map(ringOf).toSeq)

  private def regionsOfGeometry(geom: JsonNode): Seq[SubRegion] =
    geom.get("type").asText() match {
      case "Polygon" => Seq(polygonOf(geom.get("coordinates")))
      case "MultiPolygon" =>
        geom.get("coordinates").elements().asScala
          .map(polygonOf).toSeq
      case _ => Seq.empty // like the reference: other geometries ignored
    }

  private def parseGeoJson(text: String): Region = {
    val json = mapper.readTree(text)
    val members = json.get("type").asText() match {
      case "Polygon" | "MultiPolygon" => regionsOfGeometry(json)
      case "GeometryCollection" =>
        json.get("geometries").elements().asScala
          .flatMap(regionsOfGeometry).toSeq
      case "Feature" => regionsOfGeometry(json.get("geometry"))
      case "FeatureCollection" =>
        json.get("features").elements().asScala
          .flatMap(f => regionsOfGeometry(f.get("geometry"))).toSeq
      case _ => Seq.empty
    }
    new Region(members)
  }
}
