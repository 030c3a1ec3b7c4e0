package graft.functions

import graft.spatial.Region
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** `st_within_region(latDeg, lngDeg, regionText, format)` — EXACT
  * point-in-region membership for any of the reference's four region
  * formats (bbox / disc / .poly / geojson, `src/region.cpp:72-120`).
  *
  * Declarative on purpose: users state the exact predicate; the
  * [[graft.plans.RegionRewrite]] optimizer rule injects the S2
  * covering-range prune in front of it (plan-time spatial pruning,
  * `src/extract.cpp:132-143`), so the slow exact test only runs on
  * covering survivors. `prunedMarker` tags already-rewritten instances
  * so the rule is idempotent.
  *
  * The region text/format must be foldable; the parsed [[Region]] is
  * built lazily once per executor (the expression ships only strings).
  */
case class StWithinRegion(lat: Expression, lng: Expression,
                          regionText: Expression, format: Expression,
                          prunedMarker: Boolean = false)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(lat, lng, regionText, format)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = lat.nullable || lng.nullable
  override def prettyName: String = "st_within_region"

  override def checkInputDataTypes(): TypeCheckResult =
    if (lat.dataType == DoubleType && lng.dataType == DoubleType &&
      regionText.dataType == StringType && regionText.foldable &&
      format.dataType == StringType && format.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_within_region expects (DOUBLE, DOUBLE, foldable STRING, foldable STRING)")

  /** Driver/executor-side parsed region (strings-only serialization). */
  @transient lazy val region: Region = Region(
    regionText.eval().toString, format.eval().toString)

  override def eval(input: InternalRow): Any = {
    val la = lat.eval(input)
    val ln = lng.eval(input)
    if (la == null || ln == null) null
    else region.contains(la.asInstanceOf[Double], ln.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lat = newChildren(0), lng = newChildren(1),
      regionText = newChildren(2), format = newChildren(3))
}
