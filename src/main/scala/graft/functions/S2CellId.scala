package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** `s2_cell_id(latDeg, lngDeg, level) -> LONG`: the engine's spatial
  * indexing function (the reference indexes every node location at S2
  * level 16: `src/expand.cpp:151-153`, `include/osmx/util.h:9`).
  *
  * A native Catalyst expression (not a Scala UDF) so it participates in
  * whole-stage codegen: the generated code calls the static forwarder of
  * [[graft.spatial.S2]] directly — no boxing, no encoder round-trip.
  * Deterministic and null-intolerant (null in -> null out).
  */
case class S2CellId(lat: Expression, lng: Expression, level: Expression)
  extends TernaryExpression {

  override def first: Expression = lat
  override def second: Expression = lng
  override def third: Expression = level

  override def checkInputDataTypes(): TypeCheckResult =
    if (lat.dataType == DoubleType && lng.dataType == DoubleType &&
      level.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"s2_cell_id expects (DOUBLE, DOUBLE, INT), got " +
        s"(${lat.dataType}, ${lng.dataType}, ${level.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_cell_id"

  override def nullSafeEval(latV: Any, lngV: Any, lvlV: Any): Any =
    graft.spatial.S2.latLngToCellId(latV.asInstanceOf[Double],
      lngV.asInstanceOf[Double], lvlV.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo, lv) =>
      s"graft.spatial.S2.latLngToCellId($la, $lo, $lv)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(lat = newFirst, lng = newSecond, level = newThird)
}

/** Registration of graft's custom Catalyst functions, either per-session
  * ([[GraftFunctions.register]]) or via `spark.sql.extensions=
  * graft.functions.GraftExtensions` ([[GraftExtensions]]). */
object GraftFunctions {

  private val s2CellIdInfo = new ExpressionInfo(
    classOf[S2CellId].getName, null, "s2_cell_id",
    "s2_cell_id(lat, lng, level) - S2 cell id containing the point at the given level.",
    "")

  /** Arity-checked builder: a wrong-arity SQL call must fail with the
    * function's usage at analysis, not an IndexOutOfBoundsException
    * from args(i) surfacing as an internal error. */
  private def checked(name: String, n: Int)
                     (f: Seq[Expression] => Expression)
  : (String, Seq[Expression] => Expression) =
    name -> ((args: Seq[Expression]) => {
      require(args.length == n,
        s"$name expects $n argument(s), got ${args.length}")
      f(args)
    })

  /** All custom functions: name -> builder. */
  private[functions] val builders
  : Seq[(String, Seq[Expression] => Expression)] = Seq(
    checked("s2_cell_id", 3)(a => S2CellId(a(0), a(1), a(2))),
    checked("minhash_signature", 2)(a => MinHashSignature(a(0), a(1))),
    checked("simhash64", 1)(a => SimHash64(a(0))),
    checked("jaccard_sorted", 2)(a => JaccardSorted(a(0), a(1))),
    checked("jaccard_ge_sorted", 3)(a =>
      JaccardGeSorted(a(0), a(1), a(2))),
    checked("inter_size_sorted", 2)(a => InterSizeSorted(a(0), a(1))),
    checked("hash48_sort_dedup", 1)(a => Hash48SortDedup(a(0))),
    checked("ngram_hash48", 2)(a => NgramHash48(a(0), a(1))),
    checked("ngram_join", 2)(a => NgramJoin(a(0), a(1))),
    checked("winnow_fingerprint", 3)(a =>
      WinnowFingerprint(a(0), a(1), a(2))),
    checked("char_window_hashes", 2)(a => CharWindowHashes(a(0), a(1))),
    checked("cell_in_ranges", 3)(a => CellInRanges(a(0), a(1), a(2))),
    checked("ivf_assign", 2)(a => IvfAssign(a(0), a(1))),
    checked("pq_encode", 2)(a => PqEncode(a(0), a(1))),
    checked("cosine_sim", 2)(a => CosineSim(a(0), a(1))),
    checked("binary_resample", 2)(a => BinaryResample(a(0), a(1))),
    checked("lsh_first_band_pairs", 2)(a =>
      LshFirstBandPairs(a(0), a(1))),
    checked("st_within_region", 4)(a =>
      StWithinRegion(a(0), a(1), a(2), a(3))),
    checked("bloom_agg", 3)(a => BloomAgg(a(0), a(1), a(2))),
    checked("cms_agg", 3)(a => CmsAgg(a(0), a(1), a(2))),
    checked("cms_estimate", 2)(a => CmsEstimate(a(0), a(1))),
    checked("bloom_contains", 2)(a => BloomContains(a(0), a(1))),
    checked("bitmap_agg", 1)(a => BitmapAgg(a(0))),
    checked("topk_by_score", 3)(a => TopKByScore(a(0), a(1), a(2))),
    checked("bitmap_contains", 2)(a => BitmapContains(a(0), a(1))),
    checked("bitmap_cardinality", 1)(a => BitmapCardinality(a(0))))

  /** Idempotent per-session registration of every graft function, plus
    * the region-rewrite optimizer rule (plan-time spatial pruning). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
    if (!spark.experimental.extraOptimizations
      .contains(graft.plans.RegionRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RegionRewrite
  }

  /** Column-API sugar (requires [[register]] on the session first). */
  def s2CellId(lat: Column, lng: Column, level: Int): Column =
    call_function("s2_cell_id", lat.cast("double"), lng.cast("double"),
      lit(level))
}

/** `SparkSessionExtensions` hook: injects every graft function at session
  * build time (`.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[S2CellId].getName, null, name), b))
    }
    ext.injectOptimizerRule(_ => graft.plans.RegionRewrite)
  }
}
