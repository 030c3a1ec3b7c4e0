package graft.sources

import graft.sources.OsmXmlCodec.{RawNode, RawRelation, RawWay}

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.util.zip.{Deflater, DeflaterOutputStream, Inflater}
import scala.collection.mutable

/** OSM PBF (.osm.pbf) codec — the reference's primary interchange format
  * (`src/expand.cpp:273-295` reads it via libosmium; `src/extract.cpp:
  * 280-299` writes it). Implemented from the PUBLIC OSMPBF spec
  * (fileformat.proto / osmformat.proto semantics):
  *
  *   file   = repeat([int32-BE header-len][BlobHeader][Blob])
  *   blob   = zlib(PrimitiveBlock | HeaderBlock)
  *   block  = stringtable + groups of DenseNodes / Ways / Relations,
  *            ids/coords/timestamps delta-coded, tags as stringtable
  *            index pairs, granularity 100 nanodeg (so raw coordinate
  *            units == this engine's 1e7 fixed point exactly)
  *
  * Writer emits dense nodes (the format osmium produces); reader
  * accepts dense nodes, plain nodes are not emitted by any mainstream
  * writer and are rejected explicitly. date_granularity 1000 => Info
  * timestamps are epoch seconds, matching the engine's canonical form.
  */
object OsmPbfCodec {

  private val Granularity = 100 // nanodegrees per unit: raw == 1e7 fixed

  // ------------------------------------------------------------- write

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // BEST_SPEED: any zlib level is wire-valid PBF. At sf0.1 the round
    // trips are not deflate-bound (measured no delta vs the default
    // level), but at planet scale blob compression is a top CPU cost
    // and the payloads are already delta-coded + stringtable'd, so the
    // entropy left for level 6 to exploit is small
    val d = new Deflater(Deflater.BEST_SPEED)
    val z = new DeflaterOutputStream(bos, d)
    z.write(data); z.finish(); z.close(); d.end()
    bos.toByteArray
  }

  private def writeBlob(out: DataOutputStream, blobType: String,
                        payload: Array[Byte]): Unit = {
    val blob = new Pbf.Out
    blob.varintField(2, payload.length.toLong) // raw_size
    blob.bytesField(3, deflate(payload)) // zlib_data
    val blobBytes = blob.toBytes
    val header = new Pbf.Out
    header.stringField(1, blobType)
    header.varintField(3, blobBytes.length.toLong) // datasize
    val headerBytes = header.toBytes
    out.writeInt(headerBytes.length)
    out.write(headerBytes)
    out.write(blobBytes)
  }

  private final class StringTable {
    private val idx = mutable.LinkedHashMap[String, Int]("" -> 0)
    def id(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    def render: Pbf.Out = {
      val st = new Pbf.Out
      idx.keys.foreach(s => st.bytesField(1, s.getBytes("UTF-8")))
      st
    }
  }

  private def infoMsg(st: StringTable, version: Int, ts: Long, cs: Long,
                      uid: Long, user: String): Pbf.Out = {
    val m = new Pbf.Out
    m.varintField(1, version.toLong)
    m.varintField(2, ts) // date_granularity 1000 -> seconds
    m.varintField(3, cs)
    m.varintField(4, uid)
    m.varintField(5, st.id(user).toLong)
    m
  }

  /** One PrimitiveBlock holding all given elements (callers chunk). */
  private def primitiveBlock(nodes: Seq[RawNode], ways: Seq[RawWay],
                             relations: Seq[RawRelation]): Array[Byte] = {
    val st = new StringTable
    val groupMsgs = mutable.ArrayBuffer[Pbf.Out]()

    if (nodes.nonEmpty) {
      val dense = new Pbf.Out
      dense.packedSintDeltas(1, nodes.map(_.id))
      val di = new Pbf.Out
      di.packedVarints(1, nodes.map(_.version.toLong))
      di.packedSintDeltas(2, nodes.map(_.timestamp))
      di.packedSintDeltas(3, nodes.map(_.changeset))
      di.packedSintDeltas(4, nodes.map(_.uid))
      di.packedSintDeltas(5, nodes.map(n => st.id(n.user).toLong))
      dense.messageField(5, di)
      dense.packedSintDeltas(8, nodes.map(_.lat.toLong))
      dense.packedSintDeltas(9, nodes.map(_.lon.toLong))
      // keys_vals: k,v index pairs per node, 0-terminated
      dense.packedVarints(10, nodes.flatMap(n =>
        n.tags.flatMap { case (k, v) =>
          Seq(st.id(k).toLong, st.id(v).toLong)
        } :+ 0L))
      val g = new Pbf.Out
      g.messageField(2, dense)
      groupMsgs += g
    }
    if (ways.nonEmpty) {
      val g = new Pbf.Out
      ways.foreach { w =>
        val m = new Pbf.Out
        m.varintField(1, w.id)
        m.packedVarints(2, w.tags.map(t => st.id(t._1).toLong))
        m.packedVarints(3, w.tags.map(t => st.id(t._2).toLong))
        m.messageField(4, infoMsg(st, w.version, w.timestamp,
          w.changeset, w.uid, w.user))
        m.packedSintDeltas(8, w.nodes)
        g.messageField(3, m)
      }
      groupMsgs += g
    }
    if (relations.nonEmpty) {
      val g = new Pbf.Out
      relations.foreach { r =>
        val m = new Pbf.Out
        m.varintField(1, r.id)
        m.packedVarints(2, r.tags.map(t => st.id(t._1).toLong))
        m.packedVarints(3, r.tags.map(t => st.id(t._2).toLong))
        m.messageField(4, infoMsg(st, r.version, r.timestamp,
          r.changeset, r.uid, r.user))
        m.packedVarints(8, r.members.map(mm => st.id(mm._3).toLong))
        m.packedSintDeltas(9, r.members.map(_._1))
        m.packedVarints(10, r.members.map(mm => mm._2 match {
          case "node" => 0L
          case "way" => 1L
          case "relation" => 2L
          case other =>
            throw new IllegalArgumentException(s"member type $other")
        }))
        g.messageField(4, m)
      }
      groupMsgs += g
    }

    // string table must render AFTER all elements interned their strings
    val out = new Pbf.Out
    out.messageField(1, st.render)
    groupMsgs.foreach(g => out.messageField(2, g))
    out.varintField(17, Granularity.toLong)
    out.varintField(18, 1000L) // date_granularity: seconds
    out.toBytes
  }

  /** OSMHeader metadata (HeaderBlock fields of the public spec). The
    * reference writes generator, bbox and replication timestamp into
    * extract output headers (`src/extract.cpp:280-299`); the bbox is
    * omitted for antimeridian-crossing regions (`:292-294`).
    * `bbox` = (left, right, top, bottom) in NANOdegrees. */
  final case class PbfHeader(
      bbox: Option[(Long, Long, Long, Long)] = None,
      writingProgram: String = "graft",
      replicationTimestamp: Option[Long] = None,
      replicationSeqnum: Option[Long] = None)

  /** Incremental .osm.pbf writer: OSMHeader on construction, then one
    * compressed OSMData blob per flush call — the caller controls chunk
    * size, so writer memory is one chunk, never a whole partition
    * (mirrors the reference's incremental block sink,
    * /root/reference/src/extract.cpp:295-299). */
  final class StreamingPbfWriter(os: OutputStream,
                                 meta: PbfHeader = PbfHeader()) {
    private val out = new DataOutputStream(os)
    locally {
      val header = new Pbf.Out
      meta.bbox.foreach { case (left, right, top, bottom) =>
        val bb = new Pbf.Out // HeaderBBox, sint64 nanodegrees
        bb.sintField(1, left)
        bb.sintField(2, right)
        bb.sintField(3, top)
        bb.sintField(4, bottom)
        header.messageField(1, bb)
      }
      header.stringField(4, "OsmSchema-V0.6") // required_features
      header.stringField(4, "DenseNodes")
      header.stringField(16, meta.writingProgram)
      meta.replicationTimestamp.foreach(header.varintField(32, _))
      meta.replicationSeqnum.foreach(header.varintField(33, _))
      writeBlob(out, "OSMHeader", header.toBytes)
    }
    def writeNodes(ns: Seq[RawNode]): Unit =
      if (ns.nonEmpty) writeBlob(out, "OSMData", primitiveBlock(ns, Nil, Nil))
    def writeWays(ws: Seq[RawWay]): Unit =
      if (ws.nonEmpty) writeBlob(out, "OSMData", primitiveBlock(Nil, ws, Nil))
    def writeRelations(rs: Seq[RawRelation]): Unit =
      if (rs.nonEmpty) writeBlob(out, "OSMData", primitiveBlock(Nil, Nil, rs))
    def finish(): Unit = out.flush()
  }

  /** Write a complete .osm.pbf stream: OSMHeader + chunked OSMData. */
  def write(os: OutputStream, nodes: Iterator[RawNode],
            ways: Iterator[RawWay], relations: Iterator[RawRelation],
            chunk: Int = 8000, meta: PbfHeader = PbfHeader()): Unit = {
    val w = new StreamingPbfWriter(os, meta)
    nodes.grouped(chunk).foreach(ns => w.writeNodes(ns))
    ways.grouped(chunk).foreach(ws => w.writeWays(ws))
    relations.grouped(chunk).foreach(rs => w.writeRelations(rs))
    w.finish()
  }

  // -------------------------------------------------------------- read

  private def inflate(data: Array[Byte], rawSize: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](rawSize)
    var off = 0
    while (off < rawSize && !inf.finished()) {
      val n = inf.inflate(out, off, rawSize - off)
      // truncated/corrupt zlib: inflate yields 0 with no way to make
      // progress (all input consumed) — fail instead of spinning
      if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
        inf.end()
        throw new java.io.IOException(
          s"corrupt zlib blob: expected $rawSize bytes, got $off")
      }
      off += n
    }
    inf.end()
    // a stream that FINISHED early is as corrupt as one that stalled:
    // zero-padding the tail would parse as silently-skipped fields
    if (off < rawSize)
      throw new java.io.IOException(
        s"corrupt zlib blob: expected $rawSize bytes, got $off")
    out
  }

  /** Streaming parse of a .osm.pbf stream; same callback shape as
    * [[OsmXmlCodec.parse]]. */
  def parse(is: InputStream, onNode: RawNode => Unit,
            onWay: RawWay => Unit, onRelation: RawRelation => Unit)
  : Unit = {
    val in = new DataInputStream(is)
    var more = true
    while (more) readBlobUnit(in) match {
      case Some((blobType, payload, _)) =>
        if (blobType == "OSMData")
          parseBlock(payload, onNode, onWay, onRelation)
      case None => more = false
    }
  }

  /** DataSource `.option("header.*", ...)` keys -> [[PbfHeader]]:
    * `header.bbox` = "left,right,top,bottom" nanodegrees,
    * `header.generator`, `header.timestamp` (epoch s), `header.seqnum`.
    */
  def headerFromOptions(options: Map[String, String]): PbfHeader =
    PbfHeader(
      options.get("header.bbox").map { s =>
        val Array(l, r, t, b) = s.split(",").map(_.trim.toLong)
        (l, r, t, b)
      },
      options.getOrElse("header.generator", "graft"),
      options.get("header.timestamp").map(_.toLong),
      options.get("header.seqnum").map(_.toLong))

  /** Parse the OSMHeader blob of a .osm.pbf stream (stops at the first
    * OSMData blob). None when the stream has no header blob. */
  def readHeader(is: InputStream): Option[PbfHeader] = {
    val in = new DataInputStream(is)
    var result: Option[PbfHeader] = None
    var more = true
    while (more) readBlobUnit(in) match {
      case Some(("OSMHeader", payload, _)) =>
        var bbox: Option[(Long, Long, Long, Long)] = None
        var prog = ""
        var ts: Option[Long] = None
        var seq: Option[Long] = None
        val h = new Pbf.In(payload)
        while (h.hasMore) h.readTag() match {
          case (1, 2) =>
            val bb = h.readLen()
            var l = 0L; var r = 0L; var t = 0L; var b = 0L
            while (bb.hasMore) bb.readTag() match {
              case (1, 0) => l = bb.readSint()
              case (2, 0) => r = bb.readSint()
              case (3, 0) => t = bb.readSint()
              case (4, 0) => b = bb.readSint()
              case (_, w) => bb.skip(w)
            }
            bbox = Some((l, r, t, b))
          case (16, 2) => prog = new String(h.readLenBytes(), "UTF-8")
          case (32, 0) => ts = Some(h.readVarint())
          case (33, 0) => seq = Some(h.readVarint())
          case (_, w) => h.skip(w)
        }
        result = Some(PbfHeader(bbox, prog, ts, seq))
        more = false
      case Some(_) => more = false // OSMData before any header
      case None => more = false
    }
    result
  }

  /** One blob's position in a .osm.pbf file. The format is
    * blob-delimited: every [len][BlobHeader][Blob] unit decodes
    * independently, which is what makes a single planet file splittable
    * into parallel input partitions (the reference decodes blocks on
    * parallel worker threads, `src/expand.cpp:273-295`). */
  final case class BlobInfo(offset: Long, length: Long, blobType: String)

  /** Driver-side blob index: reads ONLY the 4-byte length prefixes and
    * BlobHeaders, skipping payload bytes — O(#blobs) tiny reads, no
    * decompression. */
  def scanBlobs(is: InputStream): Seq[BlobInfo] = {
    val in = new DataInputStream(is)
    val out = mutable.ArrayBuffer[BlobInfo]()
    var pos = 0L
    var eof = false
    while (!eof) {
      val headerLen =
        try in.readInt()
        catch { case _: java.io.EOFException => eof = true; 0 }
      if (!eof) {
        val headerBytes = new Array[Byte](headerLen)
        in.readFully(headerBytes)
        var blobType = ""
        var datasize = 0
        val h = new Pbf.In(headerBytes)
        while (h.hasMore) h.readTag() match {
          case (1, 2) => blobType = new String(h.readLenBytes(), "UTF-8")
          case (3, 0) => datasize = h.readVarint().toInt
          case (_, w) => h.skip(w)
        }
        var toSkip = datasize
        while (toSkip > 0) {
          val skipped = in.skipBytes(toSkip)
          if (skipped <= 0) throw new java.io.EOFException(
            s"truncated blob at offset $pos")
          toSkip -= skipped
        }
        val len = 4L + headerLen + datasize
        out += BlobInfo(pos, len, blobType)
        pos += len
      }
    }
    out.toSeq
  }

  /** Read one [len][BlobHeader][Blob] unit: (blobType, decompressed
    * payload, bytes consumed), or None at clean EOF. */
  private[sources] def readBlobUnit(in: DataInputStream)
  : Option[(String, Array[Byte], Long)] = {
    val headerLen =
      try in.readInt()
      catch { case _: java.io.EOFException => return None }
    val headerBytes = new Array[Byte](headerLen)
    in.readFully(headerBytes)
    var blobType = ""
    var datasize = 0
    val h = new Pbf.In(headerBytes)
    while (h.hasMore) h.readTag() match {
      case (1, 2) => blobType = new String(h.readLenBytes(), "UTF-8")
      case (3, 0) => datasize = h.readVarint().toInt
      case (_, w) => h.skip(w)
    }
    val blobBytes = new Array[Byte](datasize)
    in.readFully(blobBytes)

    var raw: Array[Byte] = null
    var rawSize = -1
    var zlibData: Array[Byte] = null
    val b = new Pbf.In(blobBytes)
    while (b.hasMore) b.readTag() match {
      case (1, 2) => raw = b.readLenBytes()
      case (2, 0) => rawSize = b.readVarint().toInt
      case (3, 2) => zlibData = b.readLenBytes()
      case (_, w) => b.skip(w)
    }
    val payload =
      if (raw != null) raw
      else if (zlibData != null) inflate(zlibData, rawSize)
      else throw new IllegalStateException(
        "unsupported blob compression (only raw/zlib)")
    Some((blobType, payload, 4L + headerLen + datasize))
  }

  private[sources] def parseBlock(payload: Array[Byte], onNode: RawNode => Unit,
                         onWay: RawWay => Unit,
                         onRelation: RawRelation => Unit): Unit = {
    val strings = mutable.ArrayBuffer[String]()
    val groups = mutable.ArrayBuffer[Array[Byte]]()
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGran = 1000L
    val blk = new Pbf.In(payload)
    while (blk.hasMore) blk.readTag() match {
      case (1, 2) =>
        val st = blk.readLen()
        while (st.hasMore) st.readTag() match {
          case (1, 2) => strings += new String(st.readLenBytes(), "UTF-8")
          case (_, w) => st.skip(w)
        }
      case (2, 2) => groups += blk.readLenBytes()
      case (17, 0) => granularity = blk.readVarint()
      case (18, 0) => dateGran = blk.readVarint()
      case (19, 0) => latOffset = blk.readVarint()
      case (20, 0) => lonOffset = blk.readVarint()
      case (_, w) => blk.skip(w)
    }
    def s(i: Long): String = strings(i.toInt)
    // nanodeg -> 1e7 fixed point; floorDiv so negative coordinates from
    // writers with non-multiple-of-100 granularity/offset floor the same
    // way libosmium's fixed-point conversion does
    def toE7(raw: Long, off: Long): Int =
      Math.floorDiv(off + granularity * raw, 100L).toInt
    def tsSec(t: Long): Long = t * dateGran / 1000L

    groups.foreach { gb =>
      val g = new Pbf.In(gb)
      while (g.hasMore) g.readTag() match {
        case (1, 2) =>
          throw new IllegalStateException(
            "non-dense Node groups are not supported")
        case (2, 2) => // DenseNodes
          val dn = g.readLen()
          var ids, lats, lons: Array[Long] = Array.emptyLongArray
          var kv: Array[Long] = Array.emptyLongArray
          var versions, tss, css, uids, userSids: Array[Long] =
            Array.emptyLongArray
          while (dn.hasMore) dn.readTag() match {
            case (1, 2) => ids = dn.undelta(dn.readLen().packedSints())
            case (5, 2) =>
              val di = dn.readLen()
              while (di.hasMore) di.readTag() match {
                case (1, 2) => versions = di.readLen().packedVarints()
                case (2, 2) =>
                  tss = di.undelta(di.readLen().packedSints())
                case (3, 2) =>
                  css = di.undelta(di.readLen().packedSints())
                case (4, 2) =>
                  uids = di.undelta(di.readLen().packedSints())
                case (5, 2) =>
                  userSids = di.undelta(di.readLen().packedSints())
                case (_, w) => di.skip(w)
              }
            case (8, 2) => lats = dn.undelta(dn.readLen().packedSints())
            case (9, 2) => lons = dn.undelta(dn.readLen().packedSints())
            case (10, 2) => kv = dn.readLen().packedVarints()
            case (_, w) => dn.skip(w)
          }
          var kvPos = 0
          ids.indices.foreach { i =>
            val tags = mutable.ArrayBuffer[(String, String)]()
            while (kvPos < kv.length && kv(kvPos) != 0L) {
              tags += ((s(kv(kvPos)), s(kv(kvPos + 1))))
              kvPos += 2
            }
            kvPos += 1 // the 0 terminator
            onNode(RawNode(ids(i), toE7(lons(i), lonOffset),
              toE7(lats(i), latOffset),
              if (versions.nonEmpty) versions(i).toInt else 0,
              if (tss.nonEmpty) tsSec(tss(i)) else 0L,
              if (css.nonEmpty) css(i) else 0L,
              if (uids.nonEmpty) uids(i) else 0L,
              if (userSids.nonEmpty) s(userSids(i)) else "",
              tags.toSeq))
          }
        case (3, 2) => // Way
          val m = g.readLen()
          var id = 0L
          var keys, vals, refs: Array[Long] = Array.emptyLongArray
          var version = 0; var ts = 0L; var cs = 0L; var uid = 0L
          var user = ""
          while (m.hasMore) m.readTag() match {
            case (1, 0) => id = m.readVarint()
            case (2, 2) => keys = m.readLen().packedVarints()
            case (3, 2) => vals = m.readLen().packedVarints()
            case (4, 2) =>
              val info = m.readLen()
              while (info.hasMore) info.readTag() match {
                case (1, 0) => version = info.readVarint().toInt
                case (2, 0) => ts = tsSec(info.readVarint())
                case (3, 0) => cs = info.readVarint()
                case (4, 0) => uid = info.readVarint()
                case (5, 0) => user = s(info.readVarint())
                case (_, w) => info.skip(w)
              }
            case (8, 2) => refs = m.undelta(m.readLen().packedSints())
            case (_, w) => m.skip(w)
          }
          onWay(RawWay(id, version, ts, cs, uid, user,
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              keys.zip(vals).map { case (k, v) => (s(k), s(v)) }),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(refs)))
        case (4, 2) => // Relation
          val m = g.readLen()
          var id = 0L
          var keys, vals, roles, memids, types: Array[Long] =
            Array.emptyLongArray
          var version = 0; var ts = 0L; var cs = 0L; var uid = 0L
          var user = ""
          while (m.hasMore) m.readTag() match {
            case (1, 0) => id = m.readVarint()
            case (2, 2) => keys = m.readLen().packedVarints()
            case (3, 2) => vals = m.readLen().packedVarints()
            case (4, 2) =>
              val info = m.readLen()
              while (info.hasMore) info.readTag() match {
                case (1, 0) => version = info.readVarint().toInt
                case (2, 0) => ts = tsSec(info.readVarint())
                case (3, 0) => cs = info.readVarint()
                case (4, 0) => uid = info.readVarint()
                case (5, 0) => user = s(info.readVarint())
                case (_, w) => info.skip(w)
              }
            case (8, 2) => roles = m.readLen().packedVarints()
            case (9, 2) => memids = m.undelta(m.readLen().packedSints())
            case (10, 2) => types = m.readLen().packedVarints()
            case (_, w) => m.skip(w)
          }
          val mtypes = types.map {
            case 0 => "node"
            case 1 => "way"
            case _ => "relation"
          }
          onRelation(RawRelation(id, version, ts, cs, uid, user,
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              keys.zip(vals).map { case (k, v) => (s(k), s(v)) }),
            memids.indices.map(i =>
              (memids(i), mtypes(i), s(roles(i))))))
        case (_, w) => g.skip(w)
      }
    }
  }
}
