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

  /** Sequential-fold cosine over the common prefix of two double
    * arrays: dot, norms, and the zero-norm guard in the exact HOF /
    * `list_sum` order. Null elements read as 0.0 — this is the
    * registered SQL surface, so an arbitrary user array must behave
    * identically under UnsafeArrayData (which already yields 0.0) and
    * GenericArrayData (which would otherwise NPE on unboxing). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    def at(arr: ArrayData, i: Int): Double =
      if (arr.isNullAt(i)) 0.0 else arr.getDouble(i)
    val n = math.min(a.numElements(), b.numElements())
    var dt = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = at(a, i); val y = at(b, i)
      dt += x * y; na += x * x; nb += y * y
      i += 1
    }
    // norms over each FULL array (matches norm(a) in the HOF form even
    // when lengths differ)
    var j = n
    while (j < a.numElements()) { val x = at(a, j); na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = at(b, j); nb += y * y; j += 1 }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dt / (sa * sb)
  }

  /** IVF assignment: 1-based index of the max-cosine centroid,
    * first-wins on exact ties (Java `>` is IEEE, so a later equal
    * score — including the 0.0 guard value — never displaces an
    * earlier one). `norms` are the centroids' precomputed fold norms. */
  def ivfAssign(vec: ArrayData, cents: Array[Array[Double]],
                norms: Array[Double]): Int = {
    // an empty centroid set would otherwise fabricate assignment 1 (a
    // phantom cluster every row lands in, joins matching nothing) —
    // surface the misconfigured quantizer instead
    require(cents.nonEmpty, "ivf_assign: empty centroid set")
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

  /** Product-quantization codes: per subspace the 1-based index of the
    * squared-L2-nearest centroid, first-wins on exact ties (`<` never
    * admits a later equal distance). Subspace s starts where subspace
    * s-1's centroid width ended; [[org.apache.spark.sql.catalyst.util.GenericArrayData]]
    * of Ints so the result is a plain ARRAY<INT>. */
  def pqEncode(vec: ArrayData,
               books: Array[Array[Array[Double]]]): ArrayData = {
    require(books.nonEmpty && books.forall(_.nonEmpty),
      "pq_encode: empty codebook")
    val codes = new Array[Any](books.length)
    var off = 0
    var s = 0
    while (s < books.length) {
      val book = books(s)
      val dsub = if (book.length == 0) 0 else book(0).length
      var best = 0.0
      var idx = 1
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var j = 0
        val lim = math.min(dsub, math.max(0, vec.numElements() - off))
        while (j < lim) {
          val d = vec.getDouble(off + j) - cent(j)
          acc += d * d
          j += 1
        }
        if (c == 0 || acc < best) { best = acc; idx = c + 1 }
        c += 1
      }
      codes(s) = idx
      off += dsub
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}

/** `pq_encode(vec ARRAY<DOUBLE>,
  * codebooks literal ARRAY<ARRAY<ARRAY<DOUBLE>>>) -> ARRAY<INT>`:
  * product-quantization codes — per subspace, the 1-based index of the
  * squared-L2-nearest codebook centroid (first-wins on exact ties).
  * Subspace s covers dims [sum of earlier centroid widths, +width).
  * Native for the same reason as [[IvfAssign]]: the m x |C| x d_sub
  * multiply-add runs as one JVM call in whole-stage codegen. The fold
  * is `d = x - c; acc += d * d` left-to-right — mirrored verbatim by
  * the oracle's `list_sum(list_transform(...))`. */
case class PqEncode(vec: Expression, codebooks: Expression)
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = codebooks
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebooks.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
        if codebooks.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_encode expects (ARRAY<DOUBLE>, literal ARRAY<ARRAY<ARRAY<DOUBLE>>>)")
    }

  @transient private lazy val books: Array[Array[Array[Double]]] = {
    val ad = codebooks.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { s =>
      val b = ad.getArray(s)
      Array.tabulate(b.numElements())(c => b.getArray(c).toDoubleArray())
    }
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    VectorImpl.pqEncode(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, (v, _) =>
      s"graft.functions.VectorImpl.pqEncode($v, $booksRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebooks = newRight)
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

/** `cosine_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) -> DOUBLE`: cosine
  * similarity as one fused JVM loop. The interpreted
  * zip_with/aggregate chain costs ~3 lambda dispatches per dimension
  * per pair — on a pairwise workload (kNN graphs, candidate verify)
  * that dominates the query; the kernel is bit-identical by fold
  * order (see [[VectorImpl.cosine]]). */
case class CosineSim(a: Expression, b: Expression)
  extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cosine_sim expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>)")
    }

  override def nullSafeEval(av: Any, bv: Any): Any =
    VectorImpl.cosine(av.asInstanceOf[ArrayData],
      bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.VectorImpl.cosine($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}
