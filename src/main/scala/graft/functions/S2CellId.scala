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

  private def s2CellIdBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3, "s2_cell_id expects (lat, lng, level)")
    S2CellId(args(0), args(1), args(2))
  }

  /** All custom functions: name -> builder. */
  private[functions] val builders
  : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "s2_cell_id" -> s2CellIdBuilder,
    "minhash_signature" ->
      ((args: Seq[Expression]) => MinHashSignature(args(0), args(1))),
    "simhash64" -> ((args: Seq[Expression]) => SimHash64(args(0))),
    "jaccard_sorted" ->
      ((args: Seq[Expression]) => JaccardSorted(args(0), args(1))),
    "jaccard_ge_sorted" ->
      ((args: Seq[Expression]) =>
        JaccardGeSorted(args(0), args(1), args(2))),
    "inter_size_sorted" ->
      ((args: Seq[Expression]) => InterSizeSorted(args(0), args(1))),
    "hash48_sort_dedup" ->
      ((args: Seq[Expression]) => Hash48SortDedup(args(0))),
    "ngram_hash48" ->
      ((args: Seq[Expression]) => NgramHash48(args(0), args(1))),
    "ngram_join" ->
      ((args: Seq[Expression]) => NgramJoin(args(0), args(1))),
    "winnow_fingerprint" ->
      ((args: Seq[Expression]) =>
        WinnowFingerprint(args(0), args(1), args(2))),
    "char_window_hashes" ->
      ((args: Seq[Expression]) => CharWindowHashes(args(0), args(1))),
    "cell_in_ranges" ->
      ((args: Seq[Expression]) => CellInRanges(args(0), args(1), args(2))),
    "ivf_assign" ->
      ((args: Seq[Expression]) => IvfAssign(args(0), args(1))),
    "pq_encode" ->
      ((args: Seq[Expression]) => PqEncode(args(0), args(1))),
    "cosine_sim" ->
      ((args: Seq[Expression]) => CosineSim(args(0), args(1))),
    "binary_resample" ->
      ((args: Seq[Expression]) => BinaryResample(args(0), args(1))),
    "lsh_first_band_pairs" ->
      ((args: Seq[Expression]) => LshFirstBandPairs(args(0), args(1))),
    "st_within_region" ->
      ((args: Seq[Expression]) =>
        StWithinRegion(args(0), args(1), args(2), args(3))),
    "bloom_agg" ->
      ((args: Seq[Expression]) => BloomAgg(args(0), args(1), args(2))),
    "cms_agg" ->
      ((args: Seq[Expression]) => CmsAgg(args(0), args(1), args(2))),
    "cms_estimate" ->
      ((args: Seq[Expression]) => CmsEstimate(args(0), args(1))),
    "bloom_contains" ->
      ((args: Seq[Expression]) => BloomContains(args(0), args(1))),
    "bitmap_agg" -> ((args: Seq[Expression]) => BitmapAgg(args(0))),
    "bitmap_contains" ->
      ((args: Seq[Expression]) => BitmapContains(args(0), args(1))),
    "bitmap_cardinality" ->
      ((args: Seq[Expression]) => BitmapCardinality(args(0))))

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
