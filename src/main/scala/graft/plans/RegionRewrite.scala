package graft.plans

import graft.functions.{CellInRanges, S2CellId, StWithinRegion}
import graft.spatial.Coverer
import org.apache.spark.sql.catalyst.expressions.{And, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Catalyst optimizer rule: plan-time spatial pruning.
  *
  * Rewrites every `st_within_region(lat, lng, region, fmt)` predicate
  * in a Filter into
  *
  * ```
  * cell_in_ranges(s2_cell_id(lat, lng, 16), <covering los>, <covering his>)
  *   AND st_within_region(...)     -- exact residual
  * ```
  *
  * i.e. the reference's extract planner (covering computed driver-side
  * at plan time, `src/extract.cpp:132-143`) becomes an optimizer rule:
  * the cheap codegen'd range test prunes rows (and, on cell-sorted
  * tables, parquet row groups) before the exact JTS point-in-region
  * residual runs. Conservative by construction: the covering is a
  * superset of the region, so adding the conjunct never changes
  * results. Idempotent via the expression's `prunedMarker`.
  */
object RegionRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, _) =>
        val newCond = cond.transformUp {
          case sw: StWithinRegion if !sw.prunedMarker =>
            // coveringRanges output is already lo-sorted (the
            // binary-search contract lives in Coverer.cellRanges)
            val ranges = Coverer.coveringRanges(sw.region)
            val los = Literal.create(ranges.map(_._1),
              ArrayType(LongType, containsNull = false))
            val his = Literal.create(ranges.map(_._2),
              ArrayType(LongType, containsNull = false))
            val cell = S2CellId(sw.lat, sw.lng,
              Literal.create(graft.model.Model.CellIndexLevel,
                IntegerType))
            And(CellInRanges(cell, los, his),
              sw.copy(prunedMarker = true))
        }
        if (newCond eq cond) f else f.copy(condition = newCond)
    }
}
