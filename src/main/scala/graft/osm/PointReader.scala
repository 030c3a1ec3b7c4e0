package graft.osm

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.{ColumnIOFactory, MessageColumnIO}
import org.apache.parquet.schema.MessageType

import scala.collection.concurrent.TrieMap

/** Driver-local single-key point reads over a pinned bucketed store —
  * NO Spark job. The serving-path answer BASELINE.md §QD1 documents:
  * the Spark job path's warm p50 is FLAT across a 10x store decade but
  * floored at ~50 ms of per-job scheduling cost (~100x the reference's
  * sub-ms LMDB read, `src/storage.cpp:70-77`). This reader fronts the
  * SAME immutable bucket files with the same manifest pin and the same
  * pruning ladder, minus the scheduler:
  *
  *   1. bucket prune — [[VersionedTable.bucketOfValue]] picks the ONE
  *      `__bucket=B/` directory (identical hash to the layout's);
  *   2. row-group prune — parquet-mr statistics filtering on the
  *      id-sorted key column (the B-tree-descent analog);
  *   3. page prune + record filter — parquet column indexes, then an
  *      exact key predicate, via the public parquet-mr filter2 API.
  *
  * Results are therefore byte-identical to the Spark path over the
  * same snapshot (PointReaderSpec pins equality per table, present and
  * absent keys). File listings are memoized per (table, bucket): the
  * snapshot is pinned at construction, and a later commit never
  * mutates files under an existing `v=N/` — same contract as
  * [[OsmDb]]'s cached bucket frames.
  *
  * Scale shape: a probe touches one directory listing + one file's
  * footer/index pages + one data page per column — O(1) in store size,
  * like the job path, but without the ~50 ms floor. This is a SERVING
  * convenience for single-id probes; scan/extract queries stay on
  * Spark where the same files serve distributed plans. */
final class PointReader(root: String,
                        snapshot: VersionedTable.Manifest) {

  private val conf = new Configuration()
  // file:// reads skip the CRC-verifying ChecksumFileSystem wrapper:
  // parquet pages carry their own integrity checks, and the wrapper's
  // extra .crc reads + verify passes are measurable at single-digit-ms
  // probe budgets. Other schemes (hdfs/s3) keep their defaults.
  conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
  // the SAME wrapped configuration for every probe's read options:
  // ParquetReadOptions.builder() with no config constructs (and PARSES)
  // a brand-new Hadoop Configuration per call — measured 6.4 ms of an
  // 8 ms probe. One shared immutable wrapper drops it to ~0.
  private val pconf =
    new org.apache.parquet.conf.HadoopParquetConfiguration(conf)
  private val fileCache = TrieMap[(String, Int), Seq[Path]]()

  /** Can this reader serve `table` probed by `keyCol`? (Bucketed by
    * exactly that column — same rule as the job path's bucket prune.) */
  def supports(table: String, keyCol: String): Boolean =
    snapshot.buckets.get(table).exists(_.key == keyCol)

  private def files(table: String, b: Int): Seq[Path] =
    fileCache.getOrElseUpdate((table, b), {
      val spec = snapshot.buckets(table)
      val dir = new Path(
        s"$root/v=${spec.versions(b)}/$table/__bucket=$b")
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    })

  /** Per-file cached footer + assembled schema: the footer Thrift
    * parse is the single largest slice of a naive probe (measured
    * ~7.6 ms of an ~18 ms high-level ParquetReader probe on a 100K-row
    * file) and it is immutable for the reader's lifetime — the
    * snapshot pin guarantees the file can't change underneath. */
  private final case class FileMeta(footer: ParquetMetadata,
                                    schema: MessageType,
                                    columnIO: MessageColumnIO)
  private val metaCache = TrieMap[String, FileMeta]()

  private def fileMeta(p: Path): FileMeta =
    metaCache.getOrElseUpdate(p.toString, {
      val pf = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val footer = pf.getFooter
        val schema = footer.getFileMetaData.getSchema
        FileMeta(footer, schema,
          new ColumnIOFactory().getColumnIO(schema))
      } finally pf.close()
    })

  /** Per-(file, projection) requested schema + record assembly, cached
    * like the full-schema FileMeta (both are immutable under the
    * snapshot pin). The projection preserves FILE field order so the
    * assembled Groups index identically however the caller ordered
    * `columns`. */
  private val projCache =
    TrieMap[(String, String), (MessageType, MessageColumnIO)]()

  private def projected(fm: FileMeta, p: Path, keyCol: String,
                        columns: Seq[String])
  : (MessageType, MessageColumnIO) = {
    val want = (columns :+ keyCol).toSet
    projCache.getOrElseUpdate((p.toString, want.toSeq.sorted.mkString(",")), {
      import scala.jdk.CollectionConverters._
      // tolerant of requested fields ABSENT from this file's schema
      // (stores written without optional meta, schema evolution): the
      // assembled Group then simply lacks the field and the decode
      // helpers default — exactly what full-schema reads did. Only the
      // key column is mandatory (the filter needs it).
      val fields = fm.schema.getFields.asScala.filter(f => want(f.getName))
      require(fields.exists(_.getName == keyCol),
        s"key column $keyCol absent from $p")
      val req = new MessageType(fm.schema.getName, fields.asJava)
      (req, new ColumnIOFactory().getColumnIO(req))
    })
  }

  /** Every row with `keyCol == key`, decoded as parquet example
    * Groups. Empty when the key is absent (including a bucket no row
    * ever hashed into — no directory, zero files). Per probe: row
    * groups pruned by the cached footer's key statistics, pages pruned
    * by the column index, survivors filtered record-level — all via
    * the public parquet-mr filter2 machinery.
    *
    * `columns` projects the decode: only `keyCol` + `columns` pages
    * are read and assembled (empty = key-only existence probe). The
    * unprojected overload decodes the full schema. Projection matters
    * on WIDE rows — a relation row carries ~230 KB of member arrays in
    * the sf10 synthetic store, ~29 ms of decode a tags-only caller
    * never needed (r12 verdict micro-note). */
  def rows(table: String, keyCol: String, key: Long): Seq[Group] =
    rowsProjected(table, keyCol, key, None)

  def rows(table: String, keyCol: String, key: Long,
           columns: Seq[String]): Seq[Group] =
    rowsProjected(table, keyCol, key, Some(columns))

  private def rowsProjected(table: String, keyCol: String, key: Long,
                            columns: Option[Seq[String]]): Seq[Group] = {
    val spec = snapshot.buckets.getOrElse(table,
      throw new IllegalStateException(s"$table is not bucketed"))
    require(spec.key == keyCol,
      s"$table is bucketed by ${spec.key}, not $keyCol")
    val b = VersionedTable.bucketOfValue(key, spec.nBuckets)
    files(table, b).flatMap { f =>
      val fm = fileMeta(f)
      val (schema, columnIO) = columns match {
        case None => (fm.schema, fm.columnIO)
        case Some(cs) => projected(fm, f, keyCol, cs)
      }
      val filter = FilterCompat.get(FilterApi.eq(
        FilterApi.longColumn(keyCol), java.lang.Long.valueOf(key)))
      val opts = ParquetReadOptions.builder(pconf)
        .withRecordFilter(filter).build()
      val reader = new ParquetFileReader(conf, f, fm.footer, opts)
      try {
        // restrict the column chunks the reader materializes to the
        // projection (filter evaluation only needs keyCol, which the
        // projection always contains)
        reader.setRequestedSchema(schema)
        val out = Vector.newBuilder[Group]
        var pages = reader.readNextFilteredRowGroup()
        while (pages != null) {
          val rr = columnIO.getRecordReader(pages,
            new GroupRecordConverter(schema), filter)
          var i = 0L
          val n = pages.getRowCount
          while (i < n) {
            val g = rr.read()
            // null/skip = record-filtered inside a surviving page; the
            // explicit key re-check is a belt over the filter machinery
            if (g != null && !rr.shouldSkipCurrentRecord
              && g.getLong(keyCol, 0) == key) out += g
            i += 1
          }
          pages = reader.readNextFilteredRowGroup()
        }
        out.result()
      } finally reader.close()
    }
  }

  // ---- Group decode helpers (Spark parquet physical layout:
  // 3-level LIST groups named list/element, MAP groups named
  // key_value/key/value) ----

  private def has(g: Group, field: String): Boolean =
    g.getType.containsField(field) && g.getFieldRepetitionCount(field) > 0

  /** OPTIONAL INT32 under an optional struct path, with default. */
  def structInt(g: Group, struct: String, field: String,
                default: Int): Int =
    if (!has(g, struct)) default
    else {
      val s = g.getGroup(struct, 0)
      if (!has(s, field)) default else s.getInteger(field, 0)
    }

  def long(g: Group, field: String): Long = g.getLong(field, 0)
  def int(g: Group, field: String): Int = g.getInteger(field, 0)

  def stringMap(g: Group, field: String): Map[String, String] =
    if (!has(g, field)) Map.empty
    else {
      val m = g.getGroup(field, 0)
      (0 until m.getFieldRepetitionCount("key_value")).map { i =>
        val kv = m.getGroup("key_value", i)
        val v = if (kv.getFieldRepetitionCount("value") > 0)
          kv.getString("value", 0) else null
        kv.getString("key", 0) -> v
      }.toMap
    }

  def longSeq(g: Group, field: String): Seq[Long] =
    if (!has(g, field)) Seq.empty
    else {
      val l = g.getGroup(field, 0)
      (0 until l.getFieldRepetitionCount("list"))
        .map(i => l.getGroup("list", i).getLong("element", 0))
    }

  def groupSeq(g: Group, field: String): Seq[Group] =
    if (!has(g, field)) Seq.empty
    else {
      val l = g.getGroup(field, 0)
      (0 until l.getFieldRepetitionCount("list"))
        .map(i => l.getGroup("list", i).getGroup("element", 0))
    }
}
