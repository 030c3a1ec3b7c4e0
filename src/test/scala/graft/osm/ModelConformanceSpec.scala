package graft.osm

import graft.model.Model
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** [[Model]] is the engine's canonical schema contract (SURVEY §1.4);
  * every producer of the OSM table bundle must conform to it. Names and
  * types must match exactly (nullability is producer-specific). */
class ModelConformanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def stripNull(dt: DataType): DataType =
    DataType.fromJson(dt.json.replaceAll(
      "\"nullable\":(true|false)", "\"nullable\":true")
      .replaceAll("\"containsNull\":(true|false)",
        "\"containsNull\":true")
      .replaceAll("\"valueContainsNull\":(true|false)",
        "\"valueContainsNull\":true"))

  private def assertConforms(actual: StructType, expected: StructType,
                             what: String): Unit =
    assert(stripNull(actual) == stripNull(expected),
      s"$what schema diverges from Model:\n actual  $actual\n expected $expected")

  test("SyntheticOsm tables conform to the Model schemas") {
    val t = SyntheticOsm.tables(spark, "/root/testdata/sf0.001")
    assertConforms(t.locations.schema, Model.locationsSchema, "locations")
    assertConforms(t.nodes.schema, Model.nodesSchema, "nodes")
    assertConforms(t.ways.schema, Model.waysSchema, "ways")
    assertConforms(t.relations.schema, Model.relationsSchema, "relations")
    Seq(t.nodeWay, t.nodeRelation, t.wayRelation, t.relationRelation)
      .foreach(adj => assertConforms(adj.schema, Model.adjacencySchema,
        "adjacency"))
  }

  test("osmxml relation member struct conforms to Model.memberType") {
    assertConforms(
      StructType(Seq(org.apache.spark.sql.types.StructField("m",
        graft.sources.OsmXmlSource.memberType))),
      StructType(Seq(org.apache.spark.sql.types.StructField("m",
        Model.memberType))),
      "member struct")
  }
}
