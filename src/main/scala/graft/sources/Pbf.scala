package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format primitives (public encoding spec:
  * varint / zigzag / length-delimited fields) — enough to read and
  * write the OSMPBF container without a protobuf dependency. */
object Pbf {

  final class Out {
    private val buf = new ByteArrayOutputStream()

    def toBytes: Array[Byte] = buf.toByteArray
    def size: Int = buf.size()

    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        buf.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      buf.write((v & 0x7f).toInt)
    }

    def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)

    private def tag(field: Int, wire: Int): Unit =
      writeVarint((field.toLong << 3) | wire)

    def varintField(field: Int, v: Long): Unit = {
      tag(field, 0); writeVarint(v)
    }
    def sintField(field: Int, v: Long): Unit = {
      tag(field, 0); writeVarint(zigzag(v))
    }
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); writeVarint(b.length.toLong); buf.write(b)
    }
    def stringField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes("UTF-8"))
    def messageField(field: Int, m: Out): Unit =
      bytesField(field, m.toBytes)

    /** packed repeated varints (wire 2). */
    def packedVarints(field: Int, vs: Seq[Long]): Unit =
      if (vs.nonEmpty) {
        val p = new Out
        vs.foreach(p.writeVarint)
        bytesField(field, p.toBytes)
      }
    /** packed repeated sint (zigzag) varints. */
    def packedSints(field: Int, vs: Seq[Long]): Unit =
      packedVarints(field, vs.map(zigzag))
    /** packed repeated sint DELTA-coded varints. */
    def packedSintDeltas(field: Int, vs: Seq[Long]): Unit = {
      var prev = 0L
      packedSints(field, vs.map { v => val d = v - prev; prev = v; d })
    }
  }

  final class In(bytes: Array[Byte], start: Int, end: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    private var pos = start

    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)
    def readSint(): Long = unzigzag(readVarint())

    /** (field, wire); wire 0=varint, 1=fixed64, 2=len, 5=fixed32. */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readLen(): In = {
      val n = readVarint().toInt
      val r = new In(bytes, pos, pos + n)
      pos += n
      r
    }
    def readLenBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 =>
        // NB: must read the length BEFORE adding — `pos += readVarint()`
        // captures the pre-varint pos on the left of the +=
        val n = readVarint().toInt
        pos += n
      case 5 => pos += 4
      case w => throw new IllegalStateException(s"wire $w")
    }
    // Decode-side packed readers are PRIMITIVE Array[Long] with
    // in-place unzigzag/undelta: the dense-node hot loop indexes these
    // per element, and the boxed-Seq formulation (ArrayBuffer ->
    // toSeq -> map -> map) allocated 3 boxed collections per packed
    // field (see the q52 decode numbers in README's round-9 notes).
    def packedVarints(): Array[Long] = {
      val out = new scala.collection.mutable.ArrayBuilder.ofLong
      while (hasMore) out += readVarint()
      out.result()
    }
    def packedSints(): Array[Long] = {
      val a = packedVarints()
      var i = 0
      while (i < a.length) { a(i) = unzigzag(a(i)); i += 1 }
      a
    }
    def undelta(vs: Array[Long]): Array[Long] = {
      var acc = 0L
      var i = 0
      while (i < vs.length) { acc += vs(i); vs(i) = acc; i += 1 }
      vs
    }
  }
}
