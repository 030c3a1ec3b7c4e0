package graft.spatial

/** Minimal S2 cell geometry, implemented from the published algorithm
  * (sphere -> cube-face -> quadratic ST -> Hilbert curve), sufficient for
  * the engine's spatial index: point -> cell id at a level, cell ranges,
  * vertices, children. Mirrors the role S2CellId plays in the reference
  * (`src/expand.cpp:151-153`, `src/storage.cpp:170-191`) without linking
  * the S2 library (not available in this environment).
  *
  * Cell id layout (64-bit): 3 face bits, 2*level Hilbert position bits,
  * then a trailing 1 ("lsb") marking the level, zero-padded to bit 0.
  * Level-k ids of one parent form a CONTIGUOUS leaf-id range — the
  * property the engine's range-scan pruning relies on (a covering cell
  * at level <= 16 spans exactly [rangeMin, rangeMax] of level-16 ids,
  * like the reference's child_begin/child_end scan).
  *
  * Signed-comparison note: ids on faces 4-5 have bit 63 set (negative as
  * Long). A single cell's [rangeMin, rangeMax] never crosses the sign
  * boundary (each cell lies within one face), so per-range BETWEEN
  * predicates with signed Long semantics remain correct.
  */
object S2 {
  val MaxLevel = 30

  // ---- quadratic ST<->UV transform (the standard S2_QUADRATIC_PROJECTION)
  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
    else 1 - 0.5 * math.sqrt(1 - 3 * u)

  // ---- face projections
  /** Face containing direction (x,y,z): axis of largest |component|. */
  def xyzToFace(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax > ay) { if (ax > az) (if (x > 0) 0 else 3) else (if (z > 0) 2 else 5) }
    else { if (ay > az) (if (y > 0) 1 else 4) else (if (z > 0) 2 else 5) }
  }

  def faceUv(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }

  def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  // ---- Hilbert curve tables (derived from the canonical traversal
  // (0,0),(0,1),(1,1),(1,0); swap=1 exchanges i/j, invert=2 flips both)
  private val SwapMask = 1
  private val InvertMask = 2
  // child position -> orientation modifier
  private val posToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)
  // orientation -> (ij -> child position); ij = (i<<1)|j
  private val ijToPos: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 3, 1, 2), // swap
    Array(2, 3, 1, 0), // invert
    Array(2, 1, 3, 0)) // swap | invert
  // inverse: orientation -> (pos -> ij)
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2),
    Array(0, 2, 3, 1),
    Array(3, 2, 0, 1),
    Array(3, 1, 0, 2))

  /** Leaf (level-30) id from face + 30-bit (i,j). */
  def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var pos = 0L
    var orientation = face & SwapMask
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = ijToPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= posToOrientation(p)
      k -= 1
    }
    (face.toLong << 61) | (pos << 1) | 1L
  }

  /** Decode id -> (face, i, j, orientation-at-leaf). Works for any level
    * (position bits below the level are the center path). */
  def toFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var i = 0; var j = 0
    var orientation = face & SwapMask
    val pos = (id >>> 1) & ((1L << 60) - 1)
    var k = MaxLevel - 1
    while (k >= 0) {
      val p = ((pos >>> (2 * k)) & 3).toInt
      val ij = posToIJ(orientation)(p)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= posToOrientation(p)
      k -= 1
    }
    (face, i, j)
  }

  // ---- id arithmetic
  /** Lowest set bit of a level-k id: 1 << (2*(30-k)). */
  def lsbForLevel(level: Int): Long = 1L << (2 * (MaxLevel - level))

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def parent(id: Long, lvl: Int): Long = {
    val nlsb = lsbForLevel(lvl)
    (id & -nlsb) | nlsb
  }

  /** Smallest leaf id inside this cell. */
  def rangeMin(id: Long): Long = id - (id & -id) + 1
  /** Largest leaf id inside this cell. */
  def rangeMax(id: Long): Long = id + (id & -id) - 1

  /** The [min,max] (inclusive) of level-`lvl` ids under `id`. */
  def childRangeAt(id: Long, lvl: Int): (Long, Long) = {
    val lsb = lsbForLevel(lvl)
    (rangeMin(id) + lsb - 1, rangeMax(id) - lsb + 1)
  }

  /** k-th child (0..3) of a non-leaf cell. */
  def child(id: Long, k: Int): Long = {
    val newLsb = (id & -id) >>> 2
    id + (2 * k - 3) * newLsb
  }

  // ---- point -> cell
  def latLngToXyz(latDeg: Double, lngDeg: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lng = math.toRadians(lngDeg)
    val cosLat = math.cos(lat)
    (cosLat * math.cos(lng), cosLat * math.sin(lng), math.sin(lat))
  }

  def xyzToLatLng(x: Double, y: Double, z: Double): (Double, Double) = {
    val lat = math.atan2(z, math.sqrt(x * x + y * y))
    val lng = math.atan2(y, x)
    (math.toDegrees(lat), math.toDegrees(lng))
  }

  private def stToIJ(s: Double): Int = {
    val m = (1 << MaxLevel).toDouble
    math.max(0, math.min((1 << MaxLevel) - 1, math.floor(s * m).toInt))
  }

  /** Leaf cell id for a lat/lng in degrees. */
  def latLngToLeaf(latDeg: Double, lngDeg: Double): Long = {
    val (x, y, z) = latLngToXyz(latDeg, lngDeg)
    val face = xyzToFace(x, y, z)
    val (u, v) = faceUv(face, x, y, z)
    fromFaceIJ(face, stToIJ(uvToSt(u)), stToIJ(uvToSt(v)))
  }

  /** Cell id at `level` for a lat/lng in degrees — the engine's indexing
    * function (level 16 in the reference, `include/osmx/util.h:9`). */
  def latLngToCellId(latDeg: Double, lngDeg: Double, level: Int): Long =
    parent(latLngToLeaf(latDeg, lngDeg), level)

  /** Fixed-point (1e7) variant used on the int-encoded location table. */
  def fixedToCellId(latE7: Int, lngE7: Int, level: Int): Long =
    latLngToCellId(latE7 / 1e7, lngE7 / 1e7, level)

  /** Center of a cell in degrees. */
  def cellCenter(id: Long): (Double, Double) = {
    val (face, i, j) = toFaceIJ(id)
    // center of the cell: offset half the cell size at its level
    val lvl = level(id)
    val sizeIJ = 1 << (MaxLevel - lvl)
    val si = (i & -sizeIJ) + sizeIJ / 2
    val sj = (j & -sizeIJ) + sizeIJ / 2
    val u = stToUv(si.toDouble / (1 << MaxLevel))
    val v = stToUv(sj.toDouble / (1 << MaxLevel))
    val (x, y, z) = faceUvToXyz(face, u, v)
    xyzToLatLng(x, y, z)
  }

  /** The 4 corner vertices of a cell in degrees (CCW order not
    * guaranteed; used for conservative bounding). */
  def cellVertices(id: Long): Array[(Double, Double)] = {
    val (face, i, j) = toFaceIJ(id)
    val lvl = level(id)
    val sizeIJ = 1 << (MaxLevel - lvl)
    val i0 = i & -sizeIJ; val j0 = j & -sizeIJ
    val m = (1 << MaxLevel).toDouble
    for ((ii, jj) <- Array((i0, j0), (i0 + sizeIJ, j0),
      (i0 + sizeIJ, j0 + sizeIJ), (i0, j0 + sizeIJ))) yield {
      val u = stToUv(ii / m); val v = stToUv(jj / m)
      val (x, y, z) = faceUvToXyz(face, u, v)
      xyzToLatLng(x, y, z)
    }
  }

  /** The 6 face cells (level 0). */
  def faceCells: Array[Long] =
    Array.tabulate(6)(f => (f.toLong << 61) | lsbForLevel(0))

  /** Leaf id for a possibly out-of-face (i, j) at `face`: the st->uv
    * quadratic transform extends smoothly beyond [0,1], so projecting
    * the out-of-range center through xyz and re-deriving the face gives
    * the wrapped neighbor (the role of S2CellId::FromFaceIJWrap). */
  private def fromFaceIJWrapped(face: Int, i: Int, j: Int): Long = {
    val max = 1 << MaxLevel
    if (i >= 0 && j >= 0 && i < max && j < max) fromFaceIJ(face, i, j)
    else {
      val m = max.toDouble
      val u = stToUv((i + 0.5) / m)
      val v = stToUv((j + 0.5) / m)
      val (x, y, z) = faceUvToXyz(face, u, v)
      val f2 = xyzToFace(x, y, z)
      val (u2, v2) = faceUv(f2, x, y, z)
      fromFaceIJ(f2, stToIJ(uvToSt(u2)), stToIJ(uvToSt(v2)))
    }
  }

  /** The 8 same-level neighbors (4 edge + 4 vertex) of a cell, wrapped
    * across face boundaries; fewer for cells at cube corners (duplicates
    * removed). */
  def neighbors(id: Long): Seq[Long] = {
    val lvl = level(id)
    val (face, i, j) = toFaceIJ(id)
    val size = 1 << (MaxLevel - lvl)
    val i0 = i & -size
    val j0 = j & -size
    (for {
      di <- Seq(-size, 0, size)
      dj <- Seq(-size, 0, size)
      if !(di == 0 && dj == 0)
    } yield parent(fromFaceIJWrapped(face, i0 + di, j0 + dj), lvl))
      .distinct.filterNot(_ == id)
  }
}
