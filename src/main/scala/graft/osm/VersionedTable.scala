package graft.osm

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot-isolated versioned table directory — the engine's stand-in
  * for the reference's LMDB MVCC contract (`docs/MANUAL.md:126`: one
  * writer, many readers, readers see a consistent snapshot):
  *
  * ```
  * <root>/manifest.json        <- current committed version + metadata KV
  * <root>/v=1/<table>/  (parquet files)
  * <root>/v=2/<table>/  (parquet files)
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
  * Dry-run (`--commit` absent, `src/update.cpp:287-291`): compute and
  * even write the candidate version's data, but skip the manifest swap —
  * readers never see it (the directory is garbage-collectable).
  */
object VersionedTable {

  final case class Manifest(version: Long, tables: Seq[String],
                            meta: Map[String, String])

  private val mapper = new ObjectMapper()

  private def manifestPath(root: String) = Paths.get(root, "manifest.json")

  /** Current committed manifest, if any. */
  def current(root: String): Option[Manifest] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(Files.readString(p))
      Some(Manifest(
        n.get("version").asLong(),
        n.get("tables").elements().asScala.map(_.asText()).toSeq,
        n.get("meta").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap))
    }
  }

  /** Metadata KV get (P6). */
  def metadata(root: String, key: String): Option[String] =
    current(root).flatMap(_.meta.get(key))

  /** Read `table` at the pinned `manifest` version (or the current one).
    * Reading a pinned version is stable across later commits. */
  def read(spark: SparkSession, root: String, table: String,
           pinned: Option[Manifest] = None): DataFrame = {
    val m = pinned.orElse(current(root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    spark.read.parquet(s"$root/v=${m.version}/$table")
  }

  /** Write all `tables` as the next version and atomically publish it
    * together with `meta` (merged over the previous version's meta).
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
      val node: ObjectNode = mapper.createObjectNode()
      node.put("version", next)
      val arr = node.putArray("tables")
      tables.keys.toSeq.sorted.foreach(arr.add)
      val metaNode = node.putObject("meta")
      (prev.map(_.meta).getOrElse(Map.empty) ++ meta)
        .toSeq.sortBy(_._1).foreach { case (k, v) => metaNode.put(k, v) }
      val tmp = Paths.get(root, s".manifest.$next.tmp")
      Files.createDirectories(Paths.get(root))
      Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, manifestPath(root),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    next
  }
}
