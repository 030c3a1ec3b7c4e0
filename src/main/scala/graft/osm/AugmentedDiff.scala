package graft.osm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J10: the augmented-diff change-propagation join
  * (`python/examples/augmented_diff.py:216-305`): from the elements an
  * OsmChange touches directly, find the AFFECTED parents — ways whose
  * member nodes moved, relations whose member nodes/ways changed —
  * excluding elements that are themselves in the changeset (the
  * `not in actions` idiom at `:235-241` = Spark leftanti). */
object AugmentedDiff {

  /** A8: within one batch keep only the highest version per element
    * (`augmented_diff.py:26-36`). */
  def latestVersionWins(changes: DataFrame, idCol: String = "id",
                        versionCol: String = "version"): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Affected (not directly changed) parents: output (etype, id),
    * etype in {way, relation}, ordered. */
  def affectedParents(t: SyntheticOsm.Tables, changedNodes: DataFrame,
                      changedWays: DataFrame, changedRels: DataFrame)
  : DataFrame = {
    val cn = changedNodes.select(col(changedNodes.columns.head).as("id"))
      .distinct()
    val cw = changedWays.select(col(changedWays.columns.head).as("id"))
      .distinct()
    val cr = changedRels.select(col(changedRels.columns.head).as("id"))
      .distinct()

    val affWays = t.nodeWay
      .join(cn, t.nodeWay("member_id") === cn("id"))
      .select(col("parent_id").as("id")).distinct()
      .join(cw, Seq("id"), "left_anti")

    // relations touched by changed nodes, or by changed/affected ways
    val waysTouching = cw.union(affWays).distinct()
    val affRels = t.nodeRelation
      .join(cn, t.nodeRelation("member_id") === cn("id"))
      .select(col("parent_id").as("id"))
      .union(t.wayRelation
        .join(waysTouching,
          t.wayRelation("member_id") === waysTouching("id"))
        .select(col("parent_id").as("id")))
      .distinct()
      .join(cr, Seq("id"), "left_anti")

    affWays.select(lit("way").as("etype"), col("id"))
      .unionByName(affRels.select(lit("relation").as("etype"), col("id")))
      .orderBy(col("etype"), col("id"))
  }
}
