package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-bucket LSH pair-emission kernel. Static-forwarded so whole-stage
  * codegen calls it directly. */
object LshPairsImpl {

  /** Emit (a, b) candidate pairs from one LSH bucket with FIRST-BAND
    * dedup: bucket members `ms` are (doc_id, bands) structs sorted by
    * doc_id; a pair is emitted iff NO band earlier than `band` already
    * collides for it (so across the bands x buckets stream each pair
    * surfaces exactly once, no distinct() shuffle). Pairs emit in
    * (i asc, j asc) order, a < b by the pre-sort.
    *
    * Same semantics as the Column-HOF chain it replaces
    * (`flatten(transform(ms,(x,i) -> transform(filter(slice(...),
    * y -> NOT exists(...)), ...)))`) — but one compiled O(m^2 * band)
    * loop instead of an interpreted expression-tree walk per
    * comparison. */
  def firstBandPairs(ms: ArrayData, band: Int): ArrayData = {
    val m = ms.numElements()
    // pre-extract ids and the earlier-band keys once: O(m * band)
    val ids = new Array[Long](m)
    val keys = new Array[Array[UTF8String]](m)
    var i = 0
    while (i < m) {
      val row = ms.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val b = row.getArray(1)
      val ks = new Array[UTF8String](band)
      var j = 0
      while (j < band) { ks(j) = b.getUTF8String(j); j += 1 }
      keys(i) = ks
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        var collided = false
        var b = 0
        while (!collided && b < band) {
          val x = keys(i)(b)
          val y = keys(j)(b)
          if (if (x == null) y == null else x.equals(y)) collided = true
          b += 1
        }
        if (!collided) {
          val r = new GenericInternalRow(2)
          r.setLong(0, ids(i))
          r.setLong(1, ids(j))
          out += r
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `lsh_first_band_pairs(ms ARRAY<STRUCT<doc_id BIGINT, bands
  * ARRAY<STRING>>>, band INT) -> ARRAY<STRUCT<a BIGINT, b BIGINT>>`:
  * the candidate pairs of one (band, bucket) group, deduped to the
  * first colliding band. Native because the m^2 comparisons per bucket
  * are the dedup pipeline's hot loop (q25/q27/q44/q45) and interpreted
  * higher-order functions don't codegen. */
case class LshFirstBandPairs(ms: Expression, band: Expression)
  extends BinaryExpression {

  override def left: Expression = ms
  override def right: Expression = band
  override def prettyName: String = "lsh_first_band_pairs"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (ms.dataType, band.dataType) match {
      case (ArrayType(StructType(fs), _), IntegerType)
        if fs.length == 2 && fs(0).dataType == LongType &&
          // element type matters too: the kernel getUTF8Strings the
          // band keys, so a non-string bands array must fail analysis,
          // not ClassCastException mid-task
          (fs(1).dataType match {
            case ArrayType(StringType, _) => true
            case _ => false
          }) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "lsh_first_band_pairs expects (ARRAY<STRUCT<BIGINT, ARRAY<STRING>>>, INT)")
    }

  override def nullSafeEval(m: Any, b: Any): Any =
    LshPairsImpl.firstBandPairs(m.asInstanceOf[ArrayData],
      b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, b) =>
      s"graft.functions.LshPairsImpl.firstBandPairs($m, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(ms = newLeft, band = newRight)
}
