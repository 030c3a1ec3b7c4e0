package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Byte-grid resampling kernel behind the multimodal resize stub.
  * Static-forwarded (plain object) so whole-stage codegen calls it
  * directly. */
object BinaryImpl {

  /** `n` evenly spaced byte probes from `bytes` gathered in ONE output
    * buffer — probe i reads `bytes[floor(i*len/n)]` (nearest-neighbor
    * over the byte grid, identical offsets to the old per-probe
    * substr chain but linear instead of quadratic in output size).
    * Empty input passes through empty. */
  def resample(bytes: Array[Byte], n: Int): Array[Byte] = {
    val len = bytes.length.toLong
    if (len == 0 || n <= 0) return Array.emptyByteArray
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = bytes((i * len / n).toInt)
      i += 1
    }
    out
  }
}

/** `binary_resample(bytes BINARY, n INT) -> BINARY`: n evenly spaced
  * byte probes as one payload. Native so the gather runs as a single
  * linear copy inside whole-stage codegen — the Column-API
  * `aggregate`+`concat` accumulator it replaces re-copied the output
  * prefix per probe (O(n^2) bytes). */
case class BinaryResample(bytes: Expression, n: Expression)
  extends BinaryExpression {

  override def left: Expression = bytes
  override def right: Expression = n
  override def dataType: DataType = BinaryType
  override def prettyName: String = "binary_resample"

  override def checkInputDataTypes(): TypeCheckResult =
    (bytes.dataType, n.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "binary_resample expects (BINARY, INT)")
    }

  override def nullSafeEval(b: Any, nv: Any): Any =
    BinaryImpl.resample(b.asInstanceOf[Array[Byte]], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, nv) =>
      s"graft.functions.BinaryImpl.resample($b, $nv)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bytes = newLeft, n = newRight)
}
