package graft.osm

import graft.ops.Closure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The extract pipeline (`src/extract.cpp:69-421`) as a composable
  * DataFrame program: seed nodes -> reverse joins -> relation closure ->
  * multipolygon completion (J6) -> way completion (J7) -> tagged/untagged
  * materialization (J8) -> deterministic element ordering (A7).
  *
  * Scale design: every step is a distributed join/union on id sets (the
  * reference's Roaring bitmaps become Dataset[Long]s — never collected);
  * adjacency joins shuffle on the id keys; the closure loop checkpoints
  * per round (see [[Closure]]). Output ordering is a single range-
  * partitioned sort at the very end, matching the reference's
  * nodes-then-ways-then-relations ascending-id stream.
  */
object Extract {

  final case class Selected(nodeIds: DataFrame, wayIds: DataFrame,
                            relationIds: DataFrame)

  /** Topological completion: from a seed node set to the complete
    * (node, way, relation) id sets of the extract. */
  def complete(t: SyntheticOsm.Tables, seedNodeIds: DataFrame): Selected = {
    val seeds = seedNodeIds
      .select(col(seedNodeIds.columns.head).cast("long").as("id"))
      .distinct()

    // J2: nodes -> parent ways (`src/extract.cpp:177-187`)
    val wayIds0 = seeds
      .join(t.nodeWay, seeds("id") === t.nodeWay("member_id"))
      .select(col("parent_id").as("id")).distinct()

    // J3 + J4: nodes/ways -> parent relations (`:191-209`)
    val relFromNodes = seeds
      .join(t.nodeRelation, seeds("id") === t.nodeRelation("member_id"))
      .select(col("parent_id").as("id"))
    val relFromWays = wayIds0
      .join(t.wayRelation, wayIds0("id") === t.wayRelation("member_id"))
      .select(col("parent_id").as("id"))
    val relSeeds = relFromNodes.union(relFromWays).distinct()

    // J5: transitive closure over relation_relation (`:211-237`)
    val relationIds = Closure.reachable(relSeeds, t.relationRelation,
      childCol = "member_id", parentCol = "parent_id")

    // J6: multipolygon completion — add way members OF SELECTED relations
    // tagged type=multipolygon, but only ways that exist (`:243-260`)
    val mpWayRefs = t.relations
      .join(relationIds, t.relations("id") === relationIds("id"),
        "left_semi")
      .where(element_at(col("tags"), "type") === "multipolygon")
      .select(explode(col("members")).as("m"))
      .where(col("m.mtype") === "way")
      .select(col("m.ref").as("id")).distinct()
      .join(t.ways.select(col("id")), Seq("id"), "left_semi")
    val wayIds = wayIds0.union(mpWayRefs).distinct()

    // J7: way completion — every node of every selected way (`:264-274`)
    val wayNodes = t.ways
      .join(wayIds, t.ways("id") === wayIds("id"), "left_semi")
      .select(explode(col("nodes")).as("id"))
    val nodeIds = seeds.union(wayNodes).distinct()

    Selected(nodeIds, wayIds, relationIds)
  }

  /** Sorted tag rendering "k1=v1;k2=v2" (engine-portable projection of
    * the MapType column — P8/F5). */
  def tagsToString(tags: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    array_join(transform(array_sort(map_entries(tags)),
      e => concat(e("key"), lit("="), e("value"))), ";")

  /** J8 + A7: materialize the selected sets against the entity tables.
    * Nodes come from `locations` (skip-undefined inner join) LEFT OUTER
    * the tagged `nodes` blobs (`src/extract.cpp:304-339`); output is one
    * flat schema ordered (type_rank, id) like the reference's
    * nodes/ways/relations passes. `includeUserData=false` reproduces
    * `--noUserData` GDPR stripping (`:324-328`). */
  def materialize(t: SyntheticOsm.Tables, sel: Selected,
                  includeUserData: Boolean = true): DataFrame = {
    val nodesOut = sel.nodeIds
      .join(t.locations, Seq("id")) // undefined locations skipped
      .join(t.nodes.select(col("id"), col("tags"), col("meta")),
        Seq("id"), "left_outer")
      .select(lit(0).as("trank"), col("id"),
        col("lon"), col("lat"), col("version"),
        col("meta.timestamp").as("ts"),
        when(col("tags").isNotNull, tagsToString(col("tags")))
          .as("tags_s"),
        lit(null).cast("string").as("refs_s"),
        (if (includeUserData) col("meta.user")
        else lit(null).cast("string")).as("user_s"))

    val waysOut = sel.wayIds
      .join(t.ways, Seq("id"))
      .select(lit(1).as("trank"), col("id"),
        lit(null).cast("int").as("lon"), lit(null).cast("int").as("lat"),
        col("meta.version").as("version"),
        col("meta.timestamp").as("ts"),
        tagsToString(col("tags")).as("tags_s"),
        array_join(transform(col("nodes"), n => n.cast("string")), ",")
          .as("refs_s"),
        (if (includeUserData) col("meta.user")
        else lit(null).cast("string")).as("user_s"))

    val relsOut = sel.relationIds
      .join(t.relations, Seq("id"))
      .select(lit(2).as("trank"), col("id"),
        lit(null).cast("int").as("lon"), lit(null).cast("int").as("lat"),
        col("meta.version").as("version"),
        col("meta.timestamp").as("ts"),
        tagsToString(col("tags")).as("tags_s"),
        array_join(transform(col("members"),
          m => concat_ws(":", m("mtype"), m("ref"), m("role"))), ",")
          .as("refs_s"),
        (if (includeUserData) col("meta.user")
        else lit(null).cast("string")).as("user_s"))

    nodesOut.unionByName(waysOut).unionByName(relsOut)
      .orderBy(col("trank"), col("id"))
  }
}
