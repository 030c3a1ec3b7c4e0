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

  test("minhash coefficients stay in range for any n") {
    (0 until 256).foreach { i =>
      val a = graft.functions.TextHashImpl.coeffA(i)
      val b = graft.functions.TextHashImpl.coeffB(i)
      assert(a >= 1 && a < graft.functions.TextHashImpl.P)
      assert(b >= 0 && b < graft.functions.TextHashImpl.P)
    }
  }
}
