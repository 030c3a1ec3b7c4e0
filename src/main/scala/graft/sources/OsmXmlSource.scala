package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** DataSource V2 for OSM XML element files: the engine's S1 (scan) and
  * S2 (sink) — the role libosmium's Reader/Writer plays in the reference
  * (`src/expand.cpp:273-295`, `src/extract.cpp:280-299`).
  *
  * ```
  * spark.read.format("osmxml").option("entity", "node").load(dir)
  * df.write.format("osmxml").option("entity", "node").save(dir)
  * ```
  *
  * Parallelism model mirrors the reference's: one input partition per
  * file (libosmium decodes PBF blocks on worker threads; here each file
  * is a block — a planet-scale ingest shards the input into many files).
  * Column pruning is pushed into the reader (rows are built only with
  * the requested fields). The writer emits one well-formed `.osm`
  * document per partition; `coalesce(1)` for single-file interop.
  */
class OsmXmlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmxml"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = options.asScala.toMap
    OsmXmlSource.schemaFor(OsmXmlSource.entityOf(opts),
      OsmXmlSource.changesOf(opts))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new OsmXmlTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = true
}

object OsmXmlSource {
  val memberType: StructType = StructType(Seq(
    StructField("ref", LongType, nullable = false),
    StructField("mtype", StringType, nullable = false),
    StructField("role", StringType, nullable = true)))

  private val common = Seq(
    StructField("id", LongType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("changeset", LongType, nullable = false),
    StructField("uid", LongType, nullable = false),
    StructField("user", StringType, nullable = true),
    StructField("tags", MapType(StringType, StringType), nullable = false))

  def schemaFor(entity: String, changes: Boolean = false): StructType = {
    val base = entity match {
      case "node" => StructType(
        Seq(StructField("id", LongType, nullable = false),
          StructField("lon", IntegerType, nullable = false),
          StructField("lat", IntegerType, nullable = false)) ++ common.tail)
      case "way" => StructType(common :+
        StructField("nodes", ArrayType(LongType, containsNull = false),
          nullable = false))
      case "relation" => StructType(common :+
        StructField("members", ArrayType(memberType, containsNull = false),
          nullable = false))
      case other =>
        throw new IllegalArgumentException(
          s"osmxml: entity must be node|way|relation, got '$other'")
    }
    // OsmChange (.osc) mode: each element carries its enclosing
    // create/modify/delete block (S3)
    if (changes) StructType(base :+
      StructField("action", StringType, nullable = true))
    else base
  }

  def changesOf(options: Map[String, String]): Boolean =
    options.get("changes").exists(_.equalsIgnoreCase("true"))

  def entityOf(options: Map[String, String]): String =
    options.getOrElse("entity",
      throw new IllegalArgumentException(
        "osmxml requires .option(\"entity\", \"node\"|\"way\"|\"relation\")"))

  /** Paths arrive as `path` or a JSON-array `paths` (a REAL JSON
    * parse: a comma or escape inside a path must not split it). */
  def pathsOf(options: Map[String, String]): Seq[String] = {
    val fromPaths = options.get("paths").toSeq.flatMap { js =>
      val arr = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(js)
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map(_.asText()).filter(_.nonEmpty).toSeq
    }
    val all = fromPaths ++ options.get("path").toSeq
    if (all.isEmpty) throw new IllegalArgumentException(
      "osmxml: no path given")
    all.distinct
  }

  /** Expand dirs to their .osm files (Hadoop FS, so any supported
    * filesystem works). Compressed XML (`.gz` / `.bz2`) is listed too —
    * real-world replication diffs ship as `.osc.gz` (the reference
    * inflates them natively, `src/update.cpp:272-276`). */
  def listFiles(paths: Seq[String]): Seq[String] = {
    val conf = new Configuration()
    def keep(f: String): Boolean = {
      val bare = f.stripSuffix(".gz").stripSuffix(".bz2")
      if (bare != f)
        // only XML-family payloads are inflatable for parsing; a
        // whole-file-compressed PBF can't be range-split (its blobs
        // carry their own compression) and is rejected, not inflated
        bare.endsWith(".osm") || bare.endsWith(".xml") ||
          bare.endsWith(".osc")
      else
        f.endsWith(".osm") || f.endsWith(".xml") ||
          f.endsWith(".osc") || f.endsWith(".pbf")
    }
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.getFileStatus(hp).isDirectory)
        fs.listStatus(hp).toSeq.filter(_.isFile).map(_.getPath.toString)
          .filter(keep)
      else Seq(p)
    }.sorted
  }

  /** Open `file` for XML parsing, transparently inflating gzip/bzip2
    * payloads. Sniffed by MAGIC BYTES, not extension, so `.osc.gz`
    * replication feeds and mislabelled files both decode. PBF never
    * goes through here (its blobs carry their own per-blob compression
    * and must stay seekable for range splits). */
  def openDecoded(file: String): java.io.InputStream = {
    val hp = new Path(file)
    val raw = hp.getFileSystem(new Configuration()).open(hp)
    val buf = new java.io.BufferedInputStream(raw, 1 << 16)
    buf.mark(4)
    val m = new Array[Byte](3)
    var n = 0
    var r = 0
    while (n < 3 && r >= 0) {
      r = buf.read(m, n, 3 - n)
      if (r > 0) n += r
    }
    buf.reset()
    if (n >= 2 && (m(0) & 0xff) == 0x1f && (m(1) & 0xff) == 0x8b)
      // GZIPInputStream handles multi-member streams (concatenated
      // minutely diffs are valid gzip)
      new java.util.zip.GZIPInputStream(buf, 1 << 16)
    else if (n >= 3 && m(0) == 'B' && m(1) == 'Z' && m(2) == 'h') {
      val codec = new org.apache.hadoop.io.compress.BZip2Codec()
      codec.setConf(new Configuration())
      codec.createInputStream(buf)
    } else buf
  }

  /** Target compressed bytes per PBF input partition. Planet blobs are
    * a few MB each, so the default groups a handful of blobs per task —
    * override with `.option("pbf.split.bytes", n)`. */
  val DefaultPbfSplitBytes: Long = 32L * 1024 * 1024

  /** Plan-time blob-range split of one `.osm.pbf` file: scan the blob
    * index (headers only, payloads skipped) and group contiguous blobs
    * into ~targetBytes ranges — one InputPartition each. A single
    * multi-blob planet file parallelizes across the cluster. */
  def pbfRangePartitions(file: String, targetBytes: Long)
  : Seq[InputPartition] = {
    val hp = new Path(file)
    val fs = hp.getFileSystem(new Configuration())
    val in = fs.open(hp)
    val blobs =
      try OsmPbfCodec.scanBlobs(in)
      finally in.close()
    val parts = ArrayBuffer[InputPartition]()
    var rangeStart = -1L
    var rangeEnd = -1L
    var size = 0L
    def flush(): Unit = if (rangeStart >= 0) {
      parts += OsmPbfRangePartition(file, rangeStart, rangeEnd)
      rangeStart = -1L; rangeEnd = -1L; size = 0L
    }
    blobs.foreach { b =>
      if (b.blobType != "OSMData") flush() // header/unknown: no range
      else if (rangeStart < 0) {
        rangeStart = b.offset; rangeEnd = b.offset + b.length
        size = b.length
      } else if (size + b.length > targetBytes) {
        flush()
        rangeStart = b.offset; rangeEnd = b.offset + b.length
        size = b.length
      } else {
        rangeEnd = b.offset + b.length; size += b.length
      }
    }
    flush()
    parts.toSeq
  }
}

final class OsmXmlTable(tableSchema: StructType,
                        options: Map[String, String])
  extends Table with SupportsRead with SupportsWrite {
  private val entity = OsmXmlSource.entityOf(options)

  override def name(): String = s"osmxml.$entity"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(caseInsensitiveOptions
                              : CaseInsensitiveStringMap): ScanBuilder =
    new OsmXmlScanBuilder(entity,
      OsmXmlSource.changesOf(options),
      options ++ caseInsensitiveOptions.asScala)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new OsmXmlWriteBuilder(entity,
      options ++ info.options().asScala.toMap, info.schema())
}

final class OsmXmlScanBuilder(entity: String, changes: Boolean,
                              options: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType =
    OsmXmlSource.schemaFor(entity, changes)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String = s"osmxml scan [$entity]"

    override def planInputPartitions(): Array[InputPartition] = {
      val files = OsmXmlSource.listFiles(OsmXmlSource.pathsOf(options))
      // our own writer names files part-<entity>-NNNNN.osm; when that
      // convention is present, prune other entities' files at plan time
      // (otherwise every entity scan re-parses the whole directory)
      val named = files.filter(_.matches(
        s".*part-$entity-\\d+\\.(osm\\.pbf|(osm|osc\\.xml)(\\.gz|\\.bz2)?)$$"))
      val anyNamed = files.exists(_.matches(
        ".*part-(node|way|relation)-\\d+" +
          "\\.(osm\\.pbf|(osm|osc\\.xml)(\\.gz|\\.bz2)?)$"))
      val mine = if (anyNamed) named else files
      val splitBytes = options.get("pbf.split.bytes").map(_.toLong)
        .getOrElse(OsmXmlSource.DefaultPbfSplitBytes)
      mine.flatMap { f =>
        // PBF is blob-delimited: a single planet-scale file splits into
        // many blob-range partitions (the reference's parallel block
        // decode, `src/expand.cpp:273-295`). XML has no delimiters — one
        // partition per file, streamed.
        if (f.endsWith(".pbf.gz") || f.endsWith(".pbf.bz2"))
          throw new IllegalArgumentException(
            s"osmxml: whole-file-compressed PBF is not supported ($f); " +
              "PBF blobs carry their own compression — decompress the " +
              "file, or use per-blob zlib (the format's native layout)")
        else if (f.endsWith(".pbf"))
          OsmXmlSource.pbfRangePartitions(f, splitBytes)
        else Seq(OsmXmlFilePartition(f): InputPartition)
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new OsmXmlReaderFactory(entity, changes, required.fieldNames)
  }
}

final case class OsmXmlFilePartition(path: String) extends InputPartition

/** A contiguous range of whole blobs in one `.osm.pbf` file. */
final case class OsmPbfRangePartition(path: String, start: Long,
                                      end: Long) extends InputPartition

final class OsmXmlReaderFactory(entity: String, changes: Boolean,
                                columns: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] = partition match {
    case OsmXmlFilePartition(file) =>
      new XmlPartitionReader(file, entity, changes, columns)
    case OsmPbfRangePartition(file, start, end) =>
      require(!changes, "osc change mode is XML-only")
      new PbfRangePartitionReader(file, start, end, entity, columns)
  }
}

/** Raw element -> pruned InternalRow. Column pruning happens here and
  * it prunes the WORK, not just the row width: one extractor per
  * REQUESTED column is resolved once at construction, so a pruned scan
  * (`select("id")` over a planet) never allocates the tags map, member
  * structs, or user strings of the dropped columns — those per-row
  * allocations dominate the conversion cost. */
private[sources] final class RawToRow(columns: Array[String])
  extends Serializable {
  import OsmXmlCodec._

  private def tagsMap(tags: Seq[(String, String)]) =
    new ArrayBasedMapData(
      new GenericArrayData(
        tags.map(t => UTF8String.fromString(t._1)).toArray[Any]),
      new GenericArrayData(
        tags.map(t => UTF8String.fromString(t._2)).toArray[Any]))

  private def actOf(a: String): Any =
    if (a == null) null else UTF8String.fromString(a)

  private lazy val nodeFs: Array[(RawNode, String) => Any] = columns.map {
    case "id" => (n, _) => n.id
    case "lon" => (n, _) => n.lon
    case "lat" => (n, _) => n.lat
    case "version" => (n, _) => n.version
    case "timestamp" => (n, _) => n.timestamp
    case "changeset" => (n, _) => n.changeset
    case "uid" => (n, _) => n.uid
    case "user" => (n, _) => UTF8String.fromString(n.user)
    case "tags" => (n, _) => tagsMap(n.tags)
    case "action" => (_, a) => actOf(a)
  }

  private lazy val wayFs: Array[(RawWay, String) => Any] = columns.map {
    case "id" => (w, _) => w.id
    case "version" => (w, _) => w.version
    case "timestamp" => (w, _) => w.timestamp
    case "changeset" => (w, _) => w.changeset
    case "uid" => (w, _) => w.uid
    case "user" => (w, _) => UTF8String.fromString(w.user)
    case "tags" => (w, _) => tagsMap(w.tags)
    case "nodes" => (w, _) => new GenericArrayData(w.nodes.toArray[Any])
    case "action" => (_, a) => actOf(a)
  }

  private lazy val relFs: Array[(RawRelation, String) => Any] = columns.map {
    case "id" => (r, _) => r.id
    case "version" => (r, _) => r.version
    case "timestamp" => (r, _) => r.timestamp
    case "changeset" => (r, _) => r.changeset
    case "uid" => (r, _) => r.uid
    case "user" => (r, _) => UTF8String.fromString(r.user)
    case "tags" => (r, _) => tagsMap(r.tags)
    case "members" => (r, _) => new GenericArrayData(r.members.map {
      case (ref, t, role) =>
        new GenericInternalRow(Array[Any](ref,
          UTF8String.fromString(t), UTF8String.fromString(role)))
    }.toArray[Any])
    case "action" => (_, a) => actOf(a)
  }

  def node(n: RawNode, action: String = null): InternalRow = {
    val vs = new Array[Any](nodeFs.length)
    var i = 0
    while (i < vs.length) { vs(i) = nodeFs(i)(n, action); i += 1 }
    new GenericInternalRow(vs)
  }

  def way(w: RawWay, action: String = null): InternalRow = {
    val vs = new Array[Any](wayFs.length)
    var i = 0
    while (i < vs.length) { vs(i) = wayFs(i)(w, action); i += 1 }
    new GenericInternalRow(vs)
  }

  def relation(r: RawRelation, action: String = null): InternalRow = {
    val vs = new Array[Any](relFs.length)
    var i = 0
    while (i < vs.length) { vs(i) = relFs(i)(r, action); i += 1 }
    new GenericInternalRow(vs)
  }
}

/** Streaming XML reader: rows come straight off [[OsmElementIterator]]
  * — memory is ONE element under construction, not the file. */
final class XmlPartitionReader(file: String, entity: String,
                               changes: Boolean, columns: Array[String])
  extends PartitionReader[InternalRow] {
  import OsmXmlCodec._
  private val conv = new RawToRow(columns)
  private val in = OsmXmlSource.openDecoded(file)
  private val elems = new OsmElementIterator(in)
  // change mode keeps only elements inside an action block
  private def keep(a: String): Boolean = !changes || a != null
  private val rows: Iterator[InternalRow] = elems.collect {
    case (n: RawNode, a) if entity == "node" && keep(a) =>
      conv.node(n, a)
    case (w: RawWay, a) if entity == "way" && keep(a) =>
      conv.way(w, a)
    case (r: RawRelation, a) if entity == "relation" && keep(a) =>
      conv.relation(r, a)
  }
  private var cur: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { cur = rows.next(); true } else false
  override def get(): InternalRow = cur
  override def close(): Unit = { elems.close(); in.close() }
}

/** Blob-range PBF reader: seeks to the range start and decodes one blob
  * at a time — memory is ONE decompressed block (~8k elements), the
  * reference's per-block decode shape, regardless of file size. */
final class PbfRangePartitionReader(file: String, start: Long, end: Long,
                                   entity: String, columns: Array[String])
  extends PartitionReader[InternalRow] {
  private val conv = new RawToRow(columns)
  private val in = {
    val hp = new Path(file)
    val s = hp.getFileSystem(new Configuration()).open(hp)
    s.seek(start)
    s
  }
  private val din = new java.io.DataInputStream(in)
  private var consumed = 0L
  private val pending = new java.util.ArrayDeque[InternalRow]()
  private var cur: InternalRow = _

  @annotation.tailrec
  private def fill(): Boolean =
    if (!pending.isEmpty) true
    else if (consumed >= end - start) false
    else OsmPbfCodec.readBlobUnit(din) match {
      case None => false
      case Some((blobType, payload, sz)) =>
        consumed += sz
        if (blobType == "OSMData") OsmPbfCodec.parseBlock(payload,
          n => if (entity == "node") pending.add(conv.node(n)),
          w => if (entity == "way") pending.add(conv.way(w)),
          r => if (entity == "relation") pending.add(conv.relation(r)))
        fill()
    }

  override def next(): Boolean =
    if (fill()) { cur = pending.poll(); true } else false
  override def get(): InternalRow = cur
  override def close(): Unit = din.close()
}

final class OsmXmlWriteBuilder(entity: String,
                               options: Map[String, String],
                               dataSchema: StructType)
  extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // overwrite = rewrite dir

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      private val dir = OsmXmlSource.pathsOf(options).head
      // resolve field positions by NAME so any column order works
      private val idx: Map[String, Int] =
        dataSchema.fieldNames.zipWithIndex.toMap

      override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new OsmXmlWriterFactory(entity, dir, idx,
        options.get("format").exists(_.equalsIgnoreCase("pbf")),
        options.filter(_._1.startsWith("header.")))

      /** Publish + genuine overwrite semantics for THIS entity. Tasks
        * stage into attempt-private `.part-....<taskId>.tmp` files
        * (speculation/retry-safe: two attempts of one partition never
        * touch the same path, and a task abort can only remove its own
        * staging file); exactly one commit message per partition
        * reaches here, and its staging file is renamed to the final
        * part name. Then stale finals from a PRIOR wider write and
        * orphan staging files from losing attempts are removed. Other
        * entities' files in the same directory are preserved (the
        * extract sink writes all three entities into one dir). */
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val dirPath = new Path(dir)
        val fs = dirPath.getFileSystem(new Configuration())
        val winners = messages.collect { case c: OsmXmlCommit => c }
        winners.foreach { c =>
          val fin = new Path(c.path)
          if (fs.exists(fin)) fs.delete(fin, false)
          if (!fs.rename(new Path(c.tmp), fin))
            throw new java.io.IOException(
              s"osmxml commit: rename ${c.tmp} -> $fin failed")
        }
        val written = winners.map(c => new Path(c.path).getName).toSet
        // a zero-partition write runs no DataWriters and never creates
        // the directory: an empty write is valid, not a commit failure
        if (fs.exists(dirPath) && fs.getFileStatus(dirPath).isDirectory) {
          val ls = fs.listStatus(dirPath).toSeq.filter(_.isFile)
            .map(_.getPath)
          ls.filter(_.getName.matches(
              s"part-$entity-\\d+\\.(osm(\\.pbf)?|osc\\.xml)" +
                "(\\.gz|\\.bz2)?"))
            .filterNot(p => written.contains(p.getName))
            .foreach(p => fs.delete(p, false))
          // losing speculative attempts that committed task-side but
          // whose message was not chosen leave their staging file
          ls.filter(_.getName.matches(
              s"\\.part-$entity-\\d+\\..*\\.tmp"))
            .foreach(p => fs.delete(p, false))
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        // roll back any staged-but-unpublished attempt outputs; final
        // files are untouched (they belong to a previous committed job)
        val fs = new Path(dir).getFileSystem(new Configuration())
        messages.collect { case c: OsmXmlCommit => c }
          .foreach(c => fs.delete(new Path(c.tmp), false))
      }
    }
  }
}

/** `tmp` is the task-attempt-private staging file; `path` is the final
  * name the driver renames it to in BatchWrite.commit. */
final case class OsmXmlCommit(tmp: String, path: String)
  extends WriterCommitMessage

object OsmXmlCommit {
  /** Attempt-private staging name: the taskId (unique per attempt)
    * keeps speculative or retried attempts of one partition from ever
    * opening the same file; the dot prefix + .tmp suffix keep readers'
    * extension filters and the committer's final-name regex away. */
  def tmpPath(dir: String, finalName: String, taskId: Long): Path =
    new Path(dir, s".$finalName.$taskId.tmp")
}

final class OsmXmlWriterFactory(entity: String, dir: String,
                                idx: Map[String, Int], pbf: Boolean,
                                headerOpts: Map[String, String] = Map.empty)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
  : DataWriter[InternalRow] =
    if (pbf) new OsmPbfDataWriter(entity, dir, idx, partitionId, taskId,
      headerOpts)
    else new DataWriter[InternalRow] {
    import OsmXmlCodec._
    // a schema with an `action` column writes an OsmChange (.osc)
    // document: each element wrapped in its create/modify/delete block
    // (S3's sink side, `src/update.cpp:272-276`)
    private val isChange = idx.contains("action")
    private val finalName =
      f"part-$entity%s-$partitionId%05d." +
        (if (isChange) "osc.xml" else "osm")
    private val path = OsmXmlCommit.tmpPath(dir, finalName, taskId)
    private val fs = path.getFileSystem(new Configuration())
    private val out = fs.create(path, true)
    private val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(out, "UTF-8"))
    w.write(if (isChange) changeHeader else header); w.write("\n")

    private val conv = new RowToRaw(idx)

    override def write(row: InternalRow): Unit = {
      val body = entity match {
        case "node" => renderNode(conv.node(row))
        case "way" => renderWay(conv.way(row))
        case "relation" => renderRelation(conv.relation(row))
      }
      val s =
        if (!isChange) body
        else {
          val a = if (row.isNullAt(idx("action"))) "modify"
            else row.getUTF8String(idx("action")).toString
          renderAction(a, body)
        }
      w.write(s); w.write("\n")
    }

    override def commit(): WriterCommitMessage = {
      w.write(if (isChange) changeFooter else footer)
      w.write("\n"); w.close()
      OsmXmlCommit(path.toString, new Path(dir, finalName).toString)
    }
    // abort removes only this attempt's staging file — the final path
    // may already hold a WINNING attempt's committed output
    override def abort(): Unit = { w.close(); fs.delete(path, false); () }
    override def close(): Unit = ()
  }
}

/** Shared InternalRow -> Raw element conversion (writer side). */
private[sources] final class RowToRaw(idx: Map[String, Int]) {
  import OsmXmlCodec._
  private def tagsOf(row: InternalRow): Seq[(String, String)] = {
    val m = row.getMap(idx("tags"))
    (0 until m.numElements()).map(i =>
      (m.keyArray().getUTF8String(i).toString,
        m.valueArray().getUTF8String(i).toString))
  }
  private def str(row: InternalRow, name: String): String = {
    val i = idx(name)
    if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
  }
  private def L(row: InternalRow, n: String) = row.getLong(idx(n))
  private def I(row: InternalRow, n: String) = row.getInt(idx(n))

  def node(row: InternalRow): RawNode =
    RawNode(L(row, "id"), I(row, "lon"), I(row, "lat"), I(row, "version"),
      L(row, "timestamp"), L(row, "changeset"), L(row, "uid"),
      str(row, "user"), tagsOf(row))
  def way(row: InternalRow): RawWay = {
    val nodes = row.getArray(idx("nodes"))
    RawWay(L(row, "id"), I(row, "version"), L(row, "timestamp"),
      L(row, "changeset"), L(row, "uid"), str(row, "user"), tagsOf(row),
      (0 until nodes.numElements()).map(nodes.getLong))
  }
  def relation(row: InternalRow): RawRelation = {
    val ms = row.getArray(idx("members"))
    RawRelation(L(row, "id"), I(row, "version"), L(row, "timestamp"),
      L(row, "changeset"), L(row, "uid"), str(row, "user"), tagsOf(row),
      (0 until ms.numElements()).map { i =>
        val m = ms.getStruct(i, 3)
        (m.getLong(0), m.getUTF8String(1).toString,
          if (m.isNullAt(2)) "" else m.getUTF8String(2).toString)
      })
  }
}

/** Binary PBF partition writer: streams one `.osm.pbf` file (OSMHeader
  * up front, then one compressed OSMData blob per `chunk` elements) AS
  * ROWS ARRIVE — writer memory is one chunk (8k elements), never the
  * partition, matching the reference's incremental block sink
  * (/root/reference/src/extract.cpp:295-299). */
final class OsmPbfDataWriter(entity: String, dir: String,
                             idx: Map[String, Int], partitionId: Int,
                             taskId: Long,
                             headerOpts: Map[String, String] = Map.empty,
                             chunk: Int = 8000)
  extends DataWriter[InternalRow] {
  import OsmXmlCodec.{RawNode, RawRelation, RawWay}
  private val conv = new RowToRaw(idx)
  private val nodes = ArrayBuffer[RawNode]()
  private val ways = ArrayBuffer[RawWay]()
  private val relations = ArrayBuffer[RawRelation]()
  private val finalName = f"part-$entity%s-$partitionId%05d.osm.pbf"
  private val path = OsmXmlCommit.tmpPath(dir, finalName, taskId)
  private var out: java.io.OutputStream = null
  private var w: OsmPbfCodec.StreamingPbfWriter = null

  /** Exposed for tests: buffered (not yet flushed) element count. */
  private[sources] def bufferedElements: Int =
    nodes.length + ways.length + relations.length

  private def writer(): OsmPbfCodec.StreamingPbfWriter = {
    if (w == null) {
      val fs = path.getFileSystem(new Configuration())
      out = fs.create(path, true)
      w = new OsmPbfCodec.StreamingPbfWriter(out,
        OsmPbfCodec.headerFromOptions(headerOpts))
    }
    w
  }

  private def flushFull(): Unit = {
    if (nodes.length >= chunk) { writer().writeNodes(nodes.toSeq); nodes.clear() }
    if (ways.length >= chunk) { writer().writeWays(ways.toSeq); ways.clear() }
    if (relations.length >= chunk) {
      writer().writeRelations(relations.toSeq); relations.clear()
    }
  }

  override def write(row: InternalRow): Unit = {
    entity match {
      case "node" => nodes += conv.node(row)
      case "way" => ways += conv.way(row)
      case "relation" => relations += conv.relation(row)
    }
    flushFull()
  }

  override def commit(): WriterCommitMessage = {
    val wr = writer() // header even for an empty partition
    wr.writeNodes(nodes.toSeq); nodes.clear()
    wr.writeWays(ways.toSeq); ways.clear()
    wr.writeRelations(relations.toSeq); relations.clear()
    wr.finish()
    out.close(); out = null; w = null
    OsmXmlCommit(path.toString, new Path(dir, finalName).toString)
  }
  // abort removes only this attempt's staging file — never the final
  // path, which may hold a winning attempt's committed output
  override def abort(): Unit = {
    if (out != null) { out.close(); out = null; w = null }
    val fs = path.getFileSystem(new Configuration())
    fs.delete(path, false)
    ()
  }
  override def close(): Unit =
    if (out != null) { out.close(); out = null; w = null }
}

/** `osmpbf` DataSource: same table surface as `osmxml` (reads
  * auto-detect by extension), writes binary PBF. */
class OsmPbfSource extends OsmXmlSource {
  override def shortName(): String = "osmpbf"
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val withFmt = new java.util.HashMap[String, String](properties)
    withFmt.put("format", "pbf")
    super.getTable(schema, partitioning, withFmt)
  }
}
