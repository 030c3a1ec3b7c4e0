package graft.osm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch OsmChange application (U1-U3, `src/update.cpp:17-226`) as
  * pure DataFrame transforms: each table's new version is
  * `old ANTI-JOIN changed-ids UNION visible-upserts`, and reverse
  * adjacency is recomputed with delete-then-insert by parent id (the
  * set-diff the reference computes row-by-row at `update.cpp:78-126`
  * falls out of recomputing the changed parents' rows wholesale —
  * cheaper on a cluster than the per-row diff, same result).
  *
  * These functions are pure (no writes): atomic visibility is the
  * manifest layer's job ([[VersionedTable]]), which also supplies the
  * reference's dry-run semantics (compute, don't commit,
  * `src/update.cpp:280-291`).
  */
object Changeset {

  /** U1. `changes` schema: id, visible (bool), lon, lat, version, tags
    * (MAP, empty/null = untagged), meta (nullable struct like
    * Model.nodes). Returns (locations', nodes'). A visible change with
    * tags upserts the node blob; without tags it deletes any existing
    * blob (`update.cpp:50-60`); invisible deletes both
    * (`update.cpp:33-48`). */
  def applyNodeChanges(locations: DataFrame, nodes: DataFrame,
                       changes: DataFrame): (DataFrame, DataFrame) = {
    val ids = changes.select(col("id")).distinct()
    val loc2 = locations.join(ids, Seq("id"), "left_anti")
      .unionByName(changes.where(col("visible"))
        .select(col("id"), col("lon"), col("lat"), col("version")))
    val nodes2 = nodes.join(ids, Seq("id"), "left_anti")
      .unionByName(changes
        .where(col("visible") && size(col("tags")) > 0)
        .select(col("id"), col("tags"), col("meta")))
    (loc2, nodes2)
  }

  /** U2. `changes` schema: id, visible, nodes (ARRAY<LONG>), tags, meta.
    * Returns (ways', node_way'): changed parents' adjacency rows are
    * dropped and re-derived from the new node lists. */
  def applyWayChanges(ways: DataFrame, nodeWay: DataFrame,
                      changes: DataFrame): (DataFrame, DataFrame) = {
    val ids = changes.select(col("id")).distinct()
    val ways2 = ways.join(ids, Seq("id"), "left_anti")
      .unionByName(changes.where(col("visible"))
        .select(col("id"), col("nodes"), col("tags"), col("meta")))
    val nodeWay2 = nodeWay
      .join(ids.withColumnRenamed("id", "parent_id"), Seq("parent_id"),
        "left_anti")
      .unionByName(changes.where(col("visible"))
        .select(explode(col("nodes")).as("member_id"),
          col("id").as("parent_id"))
        .distinct()
        .select(col("parent_id"), col("member_id")))
      .select(col("member_id"), col("parent_id"))
    (ways2, nodeWay2)
  }

  /** U3. `changes` schema: id, visible, members, tags, meta. Returns
    * (relations', node_relation', way_relation', relation_relation'). */
  def applyRelationChanges(relations: DataFrame, nodeRelation: DataFrame,
                           wayRelation: DataFrame,
                           relationRelation: DataFrame, changes: DataFrame)
  : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ids = changes.select(col("id")).distinct()
    val rel2 = relations.join(ids, Seq("id"), "left_anti")
      .unionByName(changes.where(col("visible"))
        .select(col("id"), col("members"), col("tags"), col("meta")))
    def adj(old: DataFrame, mtype: String): DataFrame = old
      .join(ids.withColumnRenamed("id", "parent_id"), Seq("parent_id"),
        "left_anti")
      .unionByName(changes.where(col("visible"))
        .select(explode(col("members")).as("m"), col("id").as("parent_id"))
        .where(col("m.mtype") === mtype)
        .select(col("m.ref").as("member_id"), col("parent_id"))
        .distinct()
        .select(col("parent_id"), col("member_id")))
      .select(col("member_id"), col("parent_id"))
    (rel2, adj(nodeRelation, "node"), adj(wayRelation, "way"),
      adj(relationRelation, "relation"))
  }
}
