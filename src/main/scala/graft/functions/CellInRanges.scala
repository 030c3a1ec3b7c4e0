package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-search membership test for cell-range coverings. */
object CellRangesImpl {
  /** `los`/`his` sorted (signed), disjoint, inclusive. A single S2 cell
    * range never crosses the Long sign boundary (each cell lies in one
    * face), so signed order is consistent. */
  def inRanges(cell: Long, los: Array[Long], his: Array[Long]): Boolean = {
    var lo = 0
    var hi = los.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (los(mid) <= cell) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans >= 0 && cell <= his(ans)
  }
}

/** `cell_in_ranges(cell, los, his) -> BOOLEAN`: is `cell` inside any of
  * the (sorted, disjoint, inclusive) literal ranges? O(log n) per row vs
  * the O(n) OR-of-disjuncts / nested-loop-range-join alternatives — the
  * scan-side form of the reference's `traverseCell` B-tree seek
  * (`src/storage.cpp:170-191`). The range arrays must be foldable
  * (driver-computed covering literals). */
case class CellInRanges(cell: Expression, los: Expression, his: Expression)
  extends TernaryExpression {

  override def first: Expression = cell
  override def second: Expression = los
  override def third: Expression = his
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cell_in_ranges"

  override def checkInputDataTypes(): TypeCheckResult =
    (cell.dataType, los.dataType, his.dataType) match {
      case (LongType, ArrayType(LongType, _), ArrayType(LongType, _))
        if los.foldable && his.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cell_in_ranges expects (LONG, literal ARRAY<LONG>, literal ARRAY<LONG>)")
    }

  private lazy val loArr: Array[Long] =
    los.eval().asInstanceOf[ArrayData].toLongArray()
  private lazy val hiArr: Array[Long] =
    his.eval().asInstanceOf[ArrayData].toLongArray()

  override def eval(input: InternalRow): Any = {
    val c = cell.eval(input)
    if (c == null) null
    else CellRangesImpl.inRanges(c.asInstanceOf[Long], loArr, hiArr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("cellRangeLos", loArr, "long[]")
    val hisRef = ctx.addReferenceObj("cellRangeHis", hiArr, "long[]")
    val cellGen = cell.genCode(ctx)
    ev.copy(code =
      code"""
        ${cellGen.code}
        boolean ${ev.isNull} = ${cellGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.CellRangesImpl.inRanges(
            ${cellGen.value}, $losRef, $hisRef);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(cell = newFirst, los = newSecond, his = newThird)
}
