package graft.osm

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot-isolated versioned table directory — the engine's stand-in
  * for the reference's LMDB MVCC contract (`docs/MANUAL.md:126`: one
  * writer, many readers, readers see a consistent snapshot):
  *
  * ```
  * <root>/manifest.json        <- current committed version + metadata KV
  * <root>/v=1/<table>/  (parquet files; bucketed: __bucket=B/ subdirs)
  * <root>/v=2/<table>/
  * ```
  *
  * A commit writes the NEW version's data directories first, then
  * atomically swaps `manifest.json` (write-tmp + ATOMIC_MOVE rename).
  * Readers pin a [[Manifest]] once and keep reading that version's
  * paths — a concurrent commit never mutates files under an existing
  * `v=N/`. The manifest's `meta` map is the reference's string-KV
  * metadata table (`src/storage.cpp:25-41`: replication seqnum /
  * timestamp / import filename), advanced atomically WITH the data —
  * exactly the reference's U4 single-transaction contract
  * (`src/update.cpp:281-285`).
  *
  * COPY-ON-WRITE: the manifest records, per table (and per hash bucket
  * for bucketed tables), WHICH version's directory holds its current
  * data. A delta commit rewrites only the buckets containing changed
  * keys and links every other bucket to its prior file — the
  * reference's O(changes) LMDB update (`src/update.cpp:17-226`) instead
  * of a full-table rewrite. At planet scale a minutely diff touches a
  * handful of buckets out of thousands.
  *
  * Dry-run (`--commit` absent, `src/update.cpp:287-291`): compute and
  * even write the candidate version's data, but skip the manifest swap —
  * readers never see it (the directory is garbage-collectable).
  */
object VersionedTable {

  /** Bucketed-table layout: `nBuckets` hash buckets on column `key`;
    * `versions(b)` = the version whose directory holds bucket b.
    * `schema` is the table's DDL, recorded at commit time so a table
    * that has NEVER held a row (zero parquet footers anywhere) still
    * reads back with resolvable columns — without it, a store holding
    * e.g. zero relations breaks every downstream join at analysis
    * time (CdcPropertySpec). Optional for manifests written before
    * round 9. */
  final case class BucketSpec(nBuckets: Int, key: String,
                              versions: Vector[Long],
                              schema: Option[String] = None)

  final case class Manifest(version: Long, tables: Seq[String],
                            meta: Map[String, String],
                            tableVersions: Map[String, Long] = Map.empty,
                            buckets: Map[String, BucketSpec] = Map.empty) {
    /** Version whose directory holds `table` (plain tables). */
    def versionOf(table: String): Long =
      tableVersions.getOrElse(table, version)
  }

  /** One table's contribution to a copy-on-write commit: the buckets
    * whose content changes, and the transformation from their OLD rows
    * to their NEW rows (typically `old anti-join changed-keys union
    * upserts` — [[Changeset]] shapes). Buckets not listed keep their
    * existing files untouched. */
  final case class Delta(changedBuckets: Seq[Int],
                         transform: DataFrame => DataFrame)

  private val mapper = new ObjectMapper()

  private def manifestPath(root: String) = Paths.get(root, "manifest.json")

  /** Deterministic bucket of a key column: pmod(xxhash64(key), n). */
  def bucketExpr(key: String, nBuckets: Int): Column =
    pmod(xxhash64(col(key)), lit(nBuckets.toLong)).cast("int")

  /** Bucket ids (driver-side, <= nBuckets values) that the given keys
    * hash into — the set of buckets a delta commit must rewrite. */
  def bucketsOf(keys: DataFrame, key: String, nBuckets: Int): Seq[Int] =
    keys.select(bucketExpr(key, nBuckets).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  /** Bucket of ONE long key, computed driver-side with the same
    * expression [[bucketExpr]] evaluates distributed — lets a point
    * lookup read a single bucket directory instead of the table
    * (asserted in lockstep by ManifestSpec). */
  def bucketOfValue(key: Long, nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(key)), 42L) // 42 = xxhash64's SQL seed
      .eval(null).asInstanceOf[Long]
    val m = h % nBuckets
    (if (m < 0) m + nBuckets else m).toInt
  }

  /** Current committed manifest, if any. */
  def current(root: String): Option[Manifest] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(Files.readString(p))
      val tv =
        if (n.has("tableVersions"))
          n.get("tableVersions").properties().asScala
            .map(e => e.getKey -> e.getValue.asLong()).toMap
        else Map.empty[String, Long]
      val bk =
        if (n.has("buckets"))
          n.get("buckets").properties().asScala.map { e =>
            val b = e.getValue
            e.getKey -> BucketSpec(
              b.get("nbuckets").asInt(),
              b.get("key").asText(),
              b.get("versions").elements().asScala.map(_.asLong()).toVector,
              if (b.has("schema")) Some(b.get("schema").asText()) else None)
          }.toMap
        else Map.empty[String, BucketSpec]
      Some(Manifest(
        n.get("version").asLong(),
        n.get("tables").elements().asScala.map(_.asText()).toSeq,
        n.get("meta").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap,
        tv, bk))
    }
  }

  /** Metadata KV get (P6). */
  def metadata(root: String, key: String): Option[String] =
    current(root).flatMap(_.meta.get(key))

  /** Read `table` at the pinned `manifest` version (or the current one).
    * Reading a pinned version is stable across later commits. For
    * bucketed tables this unions each bucket's owning directory — the
    * copy-on-write view. */
  def read(spark: SparkSession, root: String, table: String,
           pinned: Option[Manifest] = None): DataFrame = {
    val m = pinned.orElse(current(root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    m.buckets.get(table) match {
      case Some(spec) =>
        readBuckets(spark, root, table, spec.versions.indices, Some(m))
      case None =>
        spark.read.parquet(s"$root/v=${m.versionOf(table)}/$table")
    }
  }

  private def pathExists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      .exists(hp)
  }

  /** Read ONLY the given buckets of a bucketed table — the partition-
    * pruned scan delta commits use to touch O(changed) data. A bucket
    * no row ever hashed into has no directory (partitionBy only writes
    * populated values); such buckets read as zero rows. */
  def readBuckets(spark: SparkSession, root: String, table: String,
                  buckets: Seq[Int], pinned: Option[Manifest] = None)
  : DataFrame = {
    val m = pinned.orElse(current(root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val spec = m.buckets.getOrElse(table, throw new IllegalStateException(
      s"$table is not bucketed"))
    def bucketPath(b: Int) = s"$root/v=${spec.versions(b)}/$table/__bucket=$b"
    val existing = buckets.map(bucketPath).filter(pathExists)
    if (existing.nonEmpty) spark.read.parquet(existing: _*)
    else {
      // zero rows in every requested bucket: produce an EMPTY frame
      // with the table's real schema (from any bucket dir ever written,
      // current or historical) so downstream joins/unions still resolve
      val glob = new org.apache.hadoop.fs.Path(
        s"$root/v=*/$table/__bucket=*")
      val hits = glob.getFileSystem(
        new org.apache.hadoop.conf.Configuration()).globStatus(glob)
      if (hits != null && hits.nonEmpty)
        spark.read.parquet(hits.head.getPath.toString).limit(0)
      else spec.schema match {
        // table has never had a row: empty frame with the DDL the
        // manifest recorded at commit time, so joins still resolve
        case Some(ddl) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        case None => spark.emptyDataFrame // pre-round-9 manifest
      }
    }
  }

  private def writeManifest(root: String, m: Manifest): Unit = {
    val node: ObjectNode = mapper.createObjectNode()
    node.put("version", m.version)
    val arr = node.putArray("tables")
    m.tables.sorted.foreach(arr.add)
    val metaNode = node.putObject("meta")
    m.meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
      metaNode.put(k, v)
    }
    val tvNode = node.putObject("tableVersions")
    m.tableVersions.toSeq.sortBy(_._1).foreach { case (k, v) =>
      tvNode.put(k, v)
    }
    val bNode = node.putObject("buckets")
    m.buckets.toSeq.sortBy(_._1).foreach { case (t, spec) =>
      val s = bNode.putObject(t)
      s.put("nbuckets", spec.nBuckets)
      s.put("key", spec.key)
      spec.schema.foreach(s.put("schema", _))
      val vs = s.putArray("versions")
      spec.versions.foreach(vs.add)
    }
    val tmp = Paths.get(root, s".manifest.${m.version}.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(root),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write all `tables` as the next version and atomically publish it
    * together with `meta` (merged over the previous version's meta).
    * Tables present in the previous manifest but NOT in `tables` are
    * carried forward by link (their manifest entry keeps pointing at
    * the old version's files — nothing is rewritten).
    * With `dryRun = true` the data is computed and written but the
    * manifest is NOT swapped — the reference's no-`--commit` mode.
    * Returns the version written (committed or not). */
  def commit(root: String, tables: Map[String, DataFrame],
             meta: Map[String, String] = Map.empty,
             dryRun: Boolean = false): Long = {
    val prev = current(root)
    val next = prev.map(_.version).getOrElse(0L) + 1L
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$root/v=$next/$name")
    }
    if (!dryRun) {
      val prevM = prev.getOrElse(Manifest(0L, Nil, Map.empty))
      // carry-forward links: untouched plain tables keep their owning
      // version; tables rewritten here point at `next`; a rewritten
      // formerly-bucketed table becomes plain again
      val prevTv = prevM.tables.filterNot(prevM.buckets.contains)
        .map(t => t -> prevM.versionOf(t)).toMap
      writeManifest(root, Manifest(next,
        (prevM.tables ++ tables.keys).distinct,
        prevM.meta ++ meta,
        prevTv ++ tables.keys.map(_ -> next),
        prevM.buckets -- tables.keys))
    }
    next
  }

  /** Initial bucketed write: every table is hash-bucketed on its key
    * column into `nBuckets` `__bucket=B/` directories, rows sorted by
    * key within each bucket (point-lookup row-group pruning survives).
    * Subsequent [[commitDelta]] calls rewrite only changed buckets. */
  def commitBucketed(root: String, tables: Map[String, (DataFrame, String)],
                     nBuckets: Int, meta: Map[String, String] = Map.empty,
                     dryRun: Boolean = false): Long = {
    val prev = current(root)
    val next = prev.map(_.version).getOrElse(0L) + 1L
    tables.foreach { case (name, (df, key)) =>
      df.withColumn("__bucket", bucketExpr(key, nBuckets))
        .repartition(col("__bucket"))
        .sortWithinPartitions(col(key))
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(s"$root/v=$next/$name")
    }
    if (!dryRun) {
      val bk = tables.map { case (name, (_, key)) =>
        name -> BucketSpec(nBuckets, key, Vector.fill(nBuckets)(next),
          Some(tables(name)._1.schema.toDDL))
      }
      val prevM = prev.getOrElse(Manifest(0L, Nil, Map.empty))
      writeManifest(root, Manifest(next,
        (prevM.tables ++ tables.keys).distinct,
        prevM.meta ++ meta,
        prevM.tableVersions -- tables.keys,
        prevM.buckets ++ bk))
    }
    next
  }

  /** Garbage-collect data directories the CURRENT manifest does not
    * reference: dry-run leftovers and tables/buckets superseded by
    * later commits. Safe only when no reader still pins an older
    * manifest (the reference's one-writer/many-current-readers
    * contract, `docs/MANUAL.md:126` — LMDB reclaims old pages the same
    * way once the last reader moves on). Returns the deleted paths. */
  def vacuum(root: String): Seq[String] = current(root) match {
    case None => Seq.empty
    case Some(m) =>
      val referenced = scala.collection.mutable.Set[String]()
      m.tables.foreach { t =>
        m.buckets.get(t) match {
          case Some(spec) => spec.versions.zipWithIndex.foreach {
            case (v, b) => referenced += s"v=$v/$t/__bucket=$b"
          }
          case None => referenced += s"v=${m.versionOf(t)}/$t"
        }
      }
      val deleted = scala.collection.mutable.ArrayBuffer[String]()
      def rmTree(p: java.nio.file.Path): Unit = {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { Files.delete(q); () })
        deleted += p.toString
      }
      val rootP = Paths.get(root)
      if (Files.isDirectory(rootP)) {
        val vdirs = Files.list(rootP).iterator().asScala.toSeq
          .filter(p => p.getFileName.toString.startsWith("v="))
        vdirs.foreach { vdir =>
          val vn = vdir.getFileName.toString
          Files.list(vdir).iterator().asScala.toSeq.foreach { tdir =>
            val tn = tdir.getFileName.toString
            if (m.buckets.contains(tn)) {
              Files.list(tdir).iterator().asScala.toSeq
                .filter(_.getFileName.toString.startsWith("__bucket="))
                .foreach { bdir =>
                  if (!referenced.contains(
                    s"$vn/$tn/${bdir.getFileName}")) rmTree(bdir)
                }
              if (!Files.list(tdir).iterator().asScala
                .exists(_.getFileName.toString.startsWith("__bucket=")))
                rmTree(tdir)
            } else if (!referenced.contains(s"$vn/$tn")) rmTree(tdir)
          }
          if (!Files.list(vdir).iterator().hasNext) rmTree(vdir)
        }
      }
      deleted.toSeq
  }

  /** COPY-ON-WRITE delta commit: for each table, read ONLY its changed
    * buckets' old rows, apply the delta transform, and write ONLY those
    * buckets under `v=next`; every unchanged bucket's manifest entry
    * keeps pointing at the file that already holds it (linked, not
    * rewritten — byte-identical on disk). Tables without a delta carry
    * fully forward. One atomic manifest swap publishes data + meta. */
  /** Maintenance rewrite (the lakehouse OPTIMIZE analog): re-own EVERY
    * bucket of `table` at one fresh version via an identity [[Delta]]
    * over all buckets. After many delta commits a table's buckets
    * scatter across versions (one directory listing per distinct
    * owning version per read) and hold one file per rewrite;
    * compaction collapses them to a single `v=N` directory with one
    * sorted file per bucket. Content is unchanged — readers pinned to
    * older manifests are untouched (CoW), and [[vacuum]] afterwards
    * reclaims every superseded directory once unpinned. */
  def compact(spark: SparkSession, root: String, table: String,
              meta: Map[String, String] = Map.empty): Long = {
    val m = current(root).getOrElse(throw new IllegalStateException(
      s"no committed version at $root"))
    val spec = m.buckets.getOrElse(table, throw new IllegalStateException(
      s"$table is not bucketed"))
    commitDelta(spark, root,
      Map(table -> Delta(spec.versions.indices, identity)), meta)
  }

  def commitDelta(spark: SparkSession, root: String,
                  deltas: Map[String, Delta],
                  meta: Map[String, String] = Map.empty,
                  dryRun: Boolean = false): Long = {
    val prev = current(root).getOrElse(throw new IllegalStateException(
      s"commitDelta needs an existing bucketed commit at $root"))
    val next = prev.version + 1L
    val newBuckets = deltas.map { case (name, d) =>
      val spec = prev.buckets.getOrElse(name,
        throw new IllegalStateException(s"$name is not bucketed"))
      val changed = d.changedBuckets.distinct.sorted
      if (changed.nonEmpty) {
        val old = readBuckets(spark, root, name, changed, Some(prev))
        // guard: keep only rows that truly hash into the changed set,
        // so a buggy transform cannot leak rows into linked buckets
        val bucketCol = bucketExpr(spec.key, spec.nBuckets)
        d.transform(old)
          .withColumn("__bucket", bucketCol)
          .where(col("__bucket").isin(changed.map(Integer.valueOf): _*))
          .repartition(col("__bucket"))
          .sortWithinPartitions(col(spec.key))
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"$root/v=$next/$name")
      }
      val versions = spec.versions.zipWithIndex.map { case (v, b) =>
        if (changed.contains(b)) next else v
      }
      name -> spec.copy(versions = versions)
    }
    if (!dryRun)
      writeManifest(root, prev.copy(version = next,
        meta = prev.meta ++ meta,
        buckets = prev.buckets ++ newBuckets))
    next
  }
}
