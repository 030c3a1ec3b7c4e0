package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** OSM XML (.osm) element codec — the interchange format the reference
  * ingests and emits through libosmium (`src/expand.cpp:273-295` reads
  * `.osm.pbf`/XML; `src/extract.cpp:280-299` writes). PBF is the
  * protobuf-compressed sibling of this format; the XML flavor covers the
  * same element model (nodes/ways/relations with tags, metadata, refs)
  * with zero extra dependencies — the DataSource plumbing on top is
  * format-agnostic.
  *
  * Coordinates parse to the engine's canonical 1e7 fixed-point ints
  * (matching libosmium's fixed-point Location) and format back with
  * "%.7f" — an exact round-trip.
  */
object OsmXmlCodec {

  final case class RawNode(id: Long, lon: Int, lat: Int, version: Int,
                           timestamp: Long, changeset: Long, uid: Long,
                           user: String, tags: Seq[(String, String)])
  final case class RawWay(id: Long, version: Int, timestamp: Long,
                          changeset: Long, uid: Long, user: String,
                          tags: Seq[(String, String)], nodes: Seq[Long])
  final case class RawRelation(id: Long, version: Int, timestamp: Long,
                               changeset: Long, uid: Long, user: String,
                               tags: Seq[(String, String)],
                               members: Seq[(Long, String, String)])

  def degToE7(s: String): Int = {
    // exact fixed-point parse (avoids double rounding drift):
    // sign, integer part, up to 7 fractional digits
    val neg = s.startsWith("-")
    val t = if (neg) s.substring(1) else s
    val dot = t.indexOf('.')
    val intPart = if (dot < 0) t else t.substring(0, dot)
    val fracRaw = if (dot < 0) "" else t.substring(dot + 1)
    val frac = (fracRaw + "0000000").substring(0, 7)
    val v = intPart.toLong * 10000000L + frac.toLong
    (if (neg) -v else v).toInt
  }

  def e7ToDeg(e7: Int): String = {
    val neg = e7 < 0
    val a = math.abs(e7.toLong)
    val s = f"${a / 10000000L}%d.${a % 10000000L}%07d"
    if (neg) "-" + s else s
  }

  /** OSM XML timestamps are ISO8601 ("2020-01-01T00:00:00Z"); the
    * engine's canonical form is epoch seconds (F2). */
  def tsToIso(epochS: Long): String =
    java.time.Instant.ofEpochSecond(epochS).toString
  def isoToTs(s: String): Long =
    if (s.indexOf('T') >= 0) java.time.Instant.parse(s).getEpochSecond
    else s.toLong

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      // XML 1.0 attribute-value normalization turns literal tab/CR/LF
      // into spaces on parse — character references survive it, so a
      // tag value with a newline round-trips identically
      case '\n' => "&#10;"
      case '\r' => "&#13;"
      case '\t' => "&#9;"
      case c => c.toString
    }

  def renderNode(n: RawNode): String = {
    val sb = new StringBuilder
    sb ++= s"""  <node id="${n.id}" lat="${e7ToDeg(n.lat)}" lon="${e7ToDeg(n.lon)}" version="${n.version}" timestamp="${tsToIso(n.timestamp)}" changeset="${n.changeset}" uid="${n.uid}" user="${esc(n.user)}""""
    if (n.tags.isEmpty) sb ++= "/>"
    else {
      sb ++= ">\n"
      n.tags.foreach { case (k, v) =>
        sb ++= s"""    <tag k="${esc(k)}" v="${esc(v)}"/>\n"""
      }
      sb ++= "  </node>"
    }
    sb.result()
  }

  def renderWay(w: RawWay): String = {
    val sb = new StringBuilder
    sb ++= s"""  <way id="${w.id}" version="${w.version}" timestamp="${tsToIso(w.timestamp)}" changeset="${w.changeset}" uid="${w.uid}" user="${esc(w.user)}">\n"""
    w.nodes.foreach(r => sb ++= s"""    <nd ref="$r"/>\n""")
    w.tags.foreach { case (k, v) =>
      sb ++= s"""    <tag k="${esc(k)}" v="${esc(v)}"/>\n"""
    }
    sb ++= "  </way>"
    sb.result()
  }

  def renderRelation(r: RawRelation): String = {
    val sb = new StringBuilder
    sb ++= s"""  <relation id="${r.id}" version="${r.version}" timestamp="${tsToIso(r.timestamp)}" changeset="${r.changeset}" uid="${r.uid}" user="${esc(r.user)}">\n"""
    r.members.foreach { case (ref, mtype, role) =>
      sb ++= s"""    <member type="${esc(mtype)}" ref="$ref" role="${esc(role)}"/>\n"""
    }
    r.tags.foreach { case (k, v) =>
      sb ++= s"""    <tag k="${esc(k)}" v="${esc(v)}"/>\n"""
    }
    sb ++= "  </relation>"
    sb.result()
  }

  val header: String =
    "<?xml version='1.0' encoding='UTF-8'?>\n<osm version=\"0.6\" generator=\"graft\">"
  val footer: String = "</osm>"

  /** Streaming StAX parse of one .osm document. Emits each element via
    * the callbacks (constant memory — the reference's visitor model). */
  def parse(in: java.io.InputStream,
            onNode: RawNode => Unit,
            onWay: RawWay => Unit,
            onRelation: RawRelation => Unit): Unit =
    parseWithActions(in,
      (n, _) => onNode(n), (w, _) => onWay(w), (r, _) => onRelation(r))

  /** OsmChange (.osc) document header/footer + action rendering (S3:
    * `src/update.cpp:272-276`'s `<create>/<modify>/<delete>` blocks). */
  val changeHeader: String =
    "<?xml version='1.0' encoding='UTF-8'?>\n<osmChange version=\"0.6\" generator=\"graft\">"
  val changeFooter: String = "</osmChange>"
  def renderAction(action: String, body: String): String =
    s"  <$action>\n$body\n  </$action>"

  /** Streaming parse of either a plain `.osm` or an OsmChange `.osc`
    * document. For plain documents the action is null; inside
    * `<create>/<modify>/<delete>` blocks it is that block's name —
    * elements under `<delete>` are the reference's `visible=false` path
    * (`src/update.cpp:33-48`). */
  def parseWithActions(in: java.io.InputStream,
                       onNode: (RawNode, String) => Unit,
                       onWay: (RawWay, String) => Unit,
                       onRelation: (RawRelation, String) => Unit)
  : Unit = {
    val it = new OsmElementIterator(in)
    try while (it.hasNext) it.next() match {
      case (n: RawNode, a) => onNode(n, a)
      case (w: RawWay, a) => onWay(w, a)
      case (r: RawRelation, a) => onRelation(r, a)
      case _ =>
    } finally it.close()
  }
}

/** Pull-based streaming cursor over one `.osm`/`.osc` document: yields
  * each element as it completes, holding only the element under
  * construction — CONSTANT memory regardless of file size (the
  * DataSource reader serves rows straight off this iterator; no
  * per-file buffering). The second tuple slot is the enclosing
  * OsmChange action, or null outside change blocks. */
final class OsmElementIterator(in: java.io.InputStream)
  extends Iterator[(AnyRef, String)] with AutoCloseable {
  import OsmXmlCodec._

  private val r: XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  private def attr(name: String, default: String = ""): String = {
    val v = r.getAttributeValue(null, name)
    if (v == null) default else v
  }

  private var id = 0L; private var lon = 0; private var lat = 0
  private var version = 0
  private var ts = 0L; private var cs = 0L; private var uid = 0L
  private var user = ""
  private var action: String = null
  private val tags = mutable.ArrayBuffer[(String, String)]()
  private val nds = mutable.ArrayBuffer[Long]()
  private val members = mutable.ArrayBuffer[(Long, String, String)]()

  private var pending: (AnyRef, String) = null
  private var done = false

  private def readCommon(): Unit = {
    id = attr("id", "0").toLong
    version = attr("version", "0").toInt
    ts = isoToTs(attr("timestamp", "0"))
    cs = attr("changeset", "0").toLong
    uid = attr("uid", "0").toLong
    user = attr("user")
    tags.clear(); nds.clear(); members.clear()
  }

  private def advance(): Unit = {
    while (pending == null && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "node" =>
              readCommon()
              lat = degToE7(attr("lat", "0"))
              lon = degToE7(attr("lon", "0"))
            case "way" => readCommon()
            case "relation" => readCommon()
            case "tag" => tags += ((attr("k"), attr("v")))
            case "nd" => nds += attr("ref", "0").toLong
            case "member" =>
              members += ((attr("ref", "0").toLong, attr("type"),
                attr("role")))
            case a @ ("create" | "modify" | "delete") => action = a
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "node" =>
              pending = (RawNode(id, lon, lat, version, ts, cs, uid,
                user, tags.toSeq), action)
            case "way" =>
              pending = (RawWay(id, version, ts, cs, uid, user,
                tags.toSeq, nds.toSeq), action)
            case "relation" =>
              pending = (RawRelation(id, version, ts, cs, uid, user,
                tags.toSeq, members.toSeq), action)
            case "create" | "modify" | "delete" => action = null
            case _ =>
          }
        case _ =>
      }
    }
    if (pending == null && !done) { done = true; r.close() }
  }

  override def hasNext: Boolean = {
    if (pending == null && !done) advance()
    pending != null
  }

  override def next(): (AnyRef, String) = {
    if (!hasNext) throw new NoSuchElementException("end of document")
    val e = pending
    pending = null
    e
  }

  override def close(): Unit = r.close()
}
