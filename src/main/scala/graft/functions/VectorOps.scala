package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernels behind the similarity expressions.
  * Arithmetic is the SAME sequential left fold as the HOF formulation
  * in [[graft.llm.Similarity]] (and the DuckDB oracle's `list_sum`):
  * dot = sum_j a(j)*b(j) accumulated left to right from 0.0, cosine =
  * dot / (normA * normB) with a both-nonzero guard — so replacing the
  * interpreted zip_with/aggregate chain with this kernel is
  * bit-for-bit invisible to results.
  *
  * Static-forwarded (plain object) so whole-stage codegen calls
  * `graft.functions.VectorImpl.…` directly. */
object VectorImpl {

  /** Sequential-fold Euclidean norm. */
  def norm(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  /** IVF assignment: 1-based index of the max-cosine centroid,
    * first-wins on exact ties (Java `>` is IEEE, so a later equal
    * score — including the 0.0 guard value — never displaces an
    * earlier one). `norms` are the centroids' precomputed fold norms. */
  def ivfAssign(vec: ArrayData, cents: Array[Array[Double]],
                norms: Array[Double]): Int = {
    val n = vec.numElements()
    var s = 0.0
    var j = 0
    while (j < n) { val x = vec.getDouble(j); s += x * x; j += 1 }
    val ne = math.sqrt(s)
    var best = 0.0
    var idx = 1
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var dt = 0.0
      var m = 0
      val lim = math.min(c.length, n)
      while (m < lim) { dt += c(m) * vec.getDouble(m); m += 1 }
      val score =
        if (norms(k) == 0.0 || ne == 0.0) 0.0
        else dt / (norms(k) * ne)
      if (k == 0 || score > best) { best = score; idx = k + 1 }
      k += 1
    }
    idx
  }
}

/** `ivf_assign(vec ARRAY<DOUBLE>, centroids literal ARRAY<ARRAY<DOUBLE>>)
  * -> INT`: the 1-based nearest-centroid index by cosine. Native so the
  * |C| x dim multiply-add loop runs as one JVM call inside whole-stage
  * codegen instead of |C| interpreted zip_with/aggregate chains (the
  * TextHash precedent — same results, 10x+ on the index build). */
case class IvfAssign(vec: Expression, centroids: Expression)
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = centroids
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, centroids.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
        if centroids.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "ivf_assign expects (ARRAY<DOUBLE>, literal ARRAY<ARRAY<DOUBLE>>)")
    }

  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = centroids.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val norms: Array[Double] =
    cents.map(VectorImpl.norm)

  override def nullSafeEval(v: Any, c: Any): Any =
    VectorImpl.ivfAssign(v.asInstanceOf[ArrayData], cents, norms)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    defineCodeGen(ctx, ev, (v, _) =>
      s"graft.functions.VectorImpl.ivfAssign($v, $centsRef, $normsRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, centroids = newRight)
}
