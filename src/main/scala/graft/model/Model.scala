package graft.model

import org.apache.spark.sql.types._

/** Canonical entity model of the engine.
  *
  * Mirrors the reference's data model (see SURVEY.md §1; reference schema at
  * `include/osmx/messages.capnp:3-38`, Location packing at
  * `src/storage.cpp:88-95`) re-expressed as Spark StructTypes / case classes:
  *   - coordinates are fixed-point int32, true degrees = i / 1e7
  *   - tags are an open map (the reference's flat [k0,v0,...] list, which
  *     every reader immediately dict-ifies: `python/osmx/osmx.py:9-14`)
  *   - way.nodes is an ORDER-SIGNIFICANT array of node ids
  *   - untagged nodes exist only in `locations` (`src/expand.cpp:156`)
  */
object Model {

  /** Fixed-point scale: degrees = i / 1e7 (reference `docs/MANUAL.md:142`). */
  val CoordScale: Double = 1e7
  /** S2 index level used by the cell index (reference `include/osmx/util.h:9`). */
  val CellIndexLevel: Int = 16

  // ---------------------------------------------------------------- entities

  /** `locations` row: every node (tagged or not) has one. version survives
    * even when tags don't (reference `src/storage.cpp:91`). */
  final case class Location(id: Long, lon: Int, lat: Int, version: Int) {
    def lonDeg: Double = lon / CoordScale
    def latDeg: Double = lat / CoordScale
  }

  /** Element metadata (reference `include/osmx/messages.capnp:3-9`);
    * timestamp is epoch seconds in the reference — kept as epoch seconds
    * (LONG) on disk, exposed as TIMESTAMP via derived column. */
  final case class Meta(version: Int, timestamp: Long, changeset: Long,
                        uid: Long, user: String)

  /** Tagged node (`nodes` table holds only nodes with tags). */
  final case class Node(id: Long, tags: Map[String, String], meta: Meta)

  final case class Way(id: Long, nodes: Seq[Long],
                       tags: Map[String, String], meta: Meta)

  /** Relation member; `mtype` one of "node" | "way" | "relation"
    * (reference `include/osmx/messages.capnp:27-31`). */
  final case class Member(ref: Long, mtype: String, role: String)

  final case class Relation(id: Long, members: Seq[Member],
                            tags: Map[String, String], meta: Meta)

  // ---------------------------------------------------------------- schemas

  val metaType: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("changeset", LongType, nullable = false),
    StructField("uid", LongType, nullable = false),
    StructField("user", StringType, nullable = true)))

  val locationsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("lon", IntegerType, nullable = false),
    StructField("lat", IntegerType, nullable = false),
    StructField("version", IntegerType, nullable = false)))

  val nodesSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("meta", metaType, nullable = true)))

  val waysSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("nodes", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("meta", metaType, nullable = true)))

  val memberType: StructType = StructType(Seq(
    StructField("ref", LongType, nullable = false),
    StructField("mtype", StringType, nullable = false),
    StructField("role", StringType, nullable = true)))

  val relationsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("members", ArrayType(memberType, containsNull = false),
      nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("meta", metaType, nullable = true)))

  /** Reverse adjacency row (member -> parent); covers node_way,
    * node_relation, way_relation, relation_relation (SURVEY §1.2). */
  val adjacencySchema: StructType = StructType(Seq(
    StructField("member_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = false)))

  /** cell_node index row (SURVEY §1.2): level-16 cell -> node id. */
  val cellNodeSchema: StructType = StructType(Seq(
    StructField("s2cell", LongType, nullable = false),
    StructField("node_id", LongType, nullable = false)))

  /** metadata KV (replication seqnum / timestamp / import filename). */
  val metadataKvSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))
}
