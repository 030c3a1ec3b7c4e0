package graft

import graft.sources.OsmXmlCodec
import graft.spatial.S2
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests for the pure kernels (SURVEY §5: tests we
  * design beyond the reference's single spec file) — seeded random
  * sampling over the full domains. */
class PropertySpec extends AnyFunSuite {

  test("fixed-point coordinate text round-trips exactly") {
    val rnd = new Random(1)
    for (_ <- 1 to 2000) {
      val e7 = (math.abs(rnd.nextLong()) % 3600000001L) - 1800000000L
      assert(OsmXmlCodec.degToE7(OsmXmlCodec.e7ToDeg(e7.toInt)) == e7)
    }
  }

  test("fixed-point parse handles short fractions and sign") {
    assert(OsmXmlCodec.degToE7("1") == 10000000)
    assert(OsmXmlCodec.degToE7("-1.5") == -15000000)
    assert(OsmXmlCodec.degToE7("0.0000001") == 1)
    assert(OsmXmlCodec.degToE7("-0.0000001") == -1)
    assert(OsmXmlCodec.degToE7("179.99999") == 1799999900)
  }

  test("ISO8601 timestamp round-trips") {
    val rnd = new Random(2)
    for (_ <- 1 to 2000) {
      val ts = math.abs(rnd.nextLong()) % 4102444800L
      assert(OsmXmlCodec.isoToTs(OsmXmlCodec.tsToIso(ts)) == ts)
    }
  }

  test("S2: cell of a point contains that point's leaf at every level") {
    val rnd = new Random(3)
    for (_ <- 1 to 1000) {
      val lat = rnd.nextDouble() * 179.8 - 89.9
      val lng = rnd.nextDouble() * 360.0 - 180.0
      val lvl = rnd.nextInt(31)
      val leaf = S2.latLngToLeaf(lat, lng)
      val cell = S2.parent(leaf, lvl)
      assert(S2.level(cell) == lvl)
      assert(S2.rangeMin(cell) <= leaf && leaf <= S2.rangeMax(cell))
      val (lo, hi) = S2.childRangeAt(cell, 30)
      assert(lo == S2.rangeMin(cell) && hi == S2.rangeMax(cell))
    }
  }

  test("PBF codec round-trips randomized elements exactly") {
    import graft.sources.OsmPbfCodec
    import graft.sources.OsmXmlCodec.{RawNode, RawRelation, RawWay}
    val rnd = new Random(4)
    def str(): String = {
      // exercise unicode, quotes, xml-escapes, empties
      val pool = Seq("", "a", "Ente & <Gans>", "café", "日本語",
        "line\nbreak?", "\"quoted\"", "x" * 50)
      pool(rnd.nextInt(pool.size)) + rnd.nextInt(1000)
    }
    def tags(): Seq[(String, String)] =
      (0 until rnd.nextInt(4)).map(_ => (str(), str()))
    val nodes = (1 to 500).map { i =>
      RawNode(rnd.nextLong().abs % (1L << 50) + i,
        (rnd.nextLong().abs % 3600000001L - 1800000000L).toInt,
        (rnd.nextLong().abs % 1800000001L - 900000000L).toInt,
        rnd.nextInt(1000), rnd.nextLong().abs % 4102444800L,
        rnd.nextLong().abs % (1L << 40), rnd.nextLong().abs % (1L << 30),
        str(), tags())
    }
    val ways = (1 to 100).map { i =>
      RawWay(2000000L + i, rnd.nextInt(100), rnd.nextLong().abs % 4e9.toLong,
        rnd.nextLong().abs % (1L << 40), rnd.nextLong().abs % (1L << 30),
        str(), tags(),
        (0 until 1 + rnd.nextInt(10)).map(_ => rnd.nextLong().abs % (1L << 50)))
    }
    val rels = (1 to 50).map { i =>
      RawRelation(3000000L + i, rnd.nextInt(100),
        rnd.nextLong().abs % 4e9.toLong, rnd.nextLong().abs % (1L << 40),
        rnd.nextLong().abs % (1L << 30), str(), tags(),
        (0 until rnd.nextInt(6)).map(_ => (rnd.nextLong().abs % (1L << 50),
          Seq("node", "way", "relation")(rnd.nextInt(3)), str())))
    }
    val bos = new java.io.ByteArrayOutputStream()
    OsmPbfCodec.write(bos, nodes.iterator, ways.iterator, rels.iterator,
      chunk = 64)
    val gotN = scala.collection.mutable.ArrayBuffer[RawNode]()
    val gotW = scala.collection.mutable.ArrayBuffer[RawWay]()
    val gotR = scala.collection.mutable.ArrayBuffer[RawRelation]()
    OsmPbfCodec.parse(new java.io.ByteArrayInputStream(bos.toByteArray),
      gotN += _, gotW += _, gotR += _)
    assert(gotN.toSeq == nodes)
    assert(gotW.toSeq == ways)
    assert(gotR.toSeq == rels)
  }

  test("foreign-granularity PBF coords floor like libosmium") {
    // granularity 1000 nanodeg (not a multiple of 100 after offset),
    // negative raw values: (off + g*raw) floorDiv 100 must floor toward
    // -inf, not truncate toward zero
    import graft.sources.{OsmPbfCodec, Pbf}
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    // hand-build one PrimitiveBlock with granularity=1000, offset=50,
    // one dense node at raw lat/lon = -3 => (50 + 1000*-3)/100 floor
    // = floor(-29.5) = -30
    val st = new Pbf.Out; st.bytesField(1, "".getBytes)
    val dense = new Pbf.Out
    dense.packedSintDeltas(1, Seq(7L)) // id
    dense.packedSintDeltas(8, Seq(-3L)) // lat raw
    dense.packedSintDeltas(9, Seq(-3L)) // lon raw
    val g = new Pbf.Out; g.messageField(2, dense)
    val blk = new Pbf.Out
    blk.messageField(1, st)
    blk.messageField(2, g)
    blk.varintField(17, 1000L) // granularity
    blk.varintField(19, 50L)   // lat_offset
    blk.varintField(20, 50L)   // lon_offset
    val payload = blk.toBytes
    val blob = new Pbf.Out
    blob.varintField(2, payload.length.toLong)
    blob.bytesField(1, payload) // raw (uncompressed)
    val blobBytes = blob.toBytes
    val hdr = new Pbf.Out
    hdr.stringField(1, "OSMData")
    hdr.varintField(3, blobBytes.length.toLong)
    val hdrBytes = hdr.toBytes
    dos.writeInt(hdrBytes.length); dos.write(hdrBytes); dos.write(blobBytes)
    var got: Option[(Int, Int)] = None
    OsmPbfCodec.parse(new java.io.ByteArrayInputStream(out.toByteArray),
      n => got = Some((n.lat, n.lon)), _ => (), _ => ())
    assert(got.contains((-30, -30)), s"got $got")
  }

  test("charWindowHash48 equals substring-md5 on random unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new Random(17)
    def md548(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    }
    val alphabet = "ab c€漢😀é" // 1-, 2-, 3-, 4-byte chars
    // NOTE: the window is counted in CODEPOINTS (the surrogate pair
    // above is one), matching SQL substr semantics
    val cps = alphabet.codePoints().toArray
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(30)
      val sb = new java.lang.StringBuilder
      for (_ <- 0 until n) sb.appendCodePoint(cps(rnd.nextInt(cps.length)))
      val s = sb.toString
      val k = 1 + rnd.nextInt(8)
      val got = graft.functions.TextHashImpl
        .charWindowHash48(UTF8String.fromString(s), k).toLongArray()
      val chars = s.codePoints().toArray
      val m = math.max(chars.length - k + 1, 0)
      assert(got.length == m, s"len mismatch for '$s' k=$k")
      for (i <- 0 until m) {
        val win = new java.lang.StringBuilder
        for (j <- i until i + k) win.appendCodePoint(chars(j))
        assert(got(i) == md548(win.toString),
          s"hash mismatch at $i for '$s' k=$k")
      }
    }
  }

  test("minhash coefficients stay in range for any n") {
    (0 until 256).foreach { i =>
      val a = graft.functions.TextHashImpl.coeffA(i)
      val b = graft.functions.TextHashImpl.coeffB(i)
      assert(a >= 1 && a < graft.functions.TextHashImpl.P)
      assert(b >= 0 && b < graft.functions.TextHashImpl.P)
    }
  }

  test("jaccard_ge_sorted: early exit never drops a rounded survivor") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val impl = graft.functions.TextHashImpl
    val rnd = new scala.util.Random(7)
    def arr(xs: Array[Long]): ArrayData = ArrayData.toArrayData(xs)
    for (_ <- 1 to 2000) {
      val universe = 1 + rnd.nextInt(60)
      def set(): Array[Long] =
        (0 until universe).filter(_ => rnd.nextBoolean())
          .map(_.toLong).toArray // sorted distinct by construction
      val a = set(); val b = set()
      val t = Seq(0.3, 0.5, 0.8, 0.9)(rnd.nextInt(4))
      val exact = impl.jaccardSortedLong(arr(a), arr(b))
      val ge = impl.jaccardGeSortedLong(arr(a), arr(b), t)
      val rounded = BigDecimal(exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (rounded >= t)
        // the filterable survivors MUST come through with the exact value
        assert(ge != null && ge.doubleValue() == exact,
          s"dropped survivor: |a|=${a.length} |b|=${b.length} " +
            s"exact=$exact t=$t")
      else if (ge != null)
        // a returned value below the rounded threshold is fine (the
        // query's round()>=t filter drops it) but must still be exact
        assert(ge.doubleValue() == exact)
    }
  }
}
