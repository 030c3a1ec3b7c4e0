package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The standard training-data curation funnel, composed from the
  * pipeline operators — one declarative plan, so Catalyst fuses the
  * scalar stages (quality/langid are map-side) and only the dedup
  * stages shuffle:
  *
  *   1. exact dedup        (one hash-agg shuffle on the fingerprint)
  *   2. near-dup survivors (LSH bucket shuffle + map-side verify)
  *   3. quality floor      (map-side)
  *   4. language allowlist (map-side)
  *
  * Order matters at scale: dedup first so quality/langid never run on
  * rows that were going to be dropped as duplicates of a survivor, and
  * exact-before-near so the LSH stage sees each distinct content once.
  */
object Curate {

  final case class Report(input: Long, afterExact: Long,
                          afterNearDup: Long, afterQuality: Long,
                          output: Long)

  def curate(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id", minQuality: Double = 0.5,
             langs: Seq[String] = Seq("en"),
             nearDupThreshold: Double = 0.6): DataFrame = {
    val exact = Dedup.exactDedup(docs, textCol, idCol)
    val nearDup = Dedup.nearDupSurvivors(exact, textCol, idCol,
      nearDupThreshold)
    nearDup
      .where(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .where(TextFunctions.langId(col(textCol))
        .isin(langs.map(l => l: Any): _*))
  }

  /** Same funnel with per-stage counts (each count is an action; use
    * for audits, not hot paths). */
  def curateWithReport(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       minQuality: Double = 0.5,
                       langs: Seq[String] = Seq("en"),
                       nearDupThreshold: Double = 0.6)
  : (DataFrame, Report) = {
    val input = docs.count()
    val exact = Dedup.exactDedup(docs, textCol, idCol)
    val nExact = exact.count()
    val nearDup = Dedup.nearDupSurvivors(exact, textCol, idCol,
      nearDupThreshold)
    val nNear = nearDup.count()
    val qual = nearDup
      .where(TextFunctions.qualityScore(col(textCol)) >= minQuality)
    val nQual = qual.count()
    val out = qual.where(TextFunctions.langId(col(textCol))
      .isin(langs.map(l => l: Any): _*))
    (out, Report(input, nExact, nNear, nQual, out.count()))
  }

  /** Deterministic permyriad bucket (0..9999) for split assignment and
    * sampling: first 8 hex digits of md5(salt || id) mod 10000. Pure
    * map-side, no RNG state — the same row lands in the same bucket on
    * ANY engine, partitioning, or rerun. That reproducibility is the
    * property `randomSplit`/`sample` (seeded per-partition RNG — moves
    * with repartitioning) cannot give, and it is what makes train/val
    * assignment stable as a 100 TB corpus is re-curated incrementally:
    * adding documents never reshuffles existing ones across splits. */
  def hashBucket(id: Column, salt: String = "graft"): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long") % 10000

  /** Named split by contiguous bucket ranges; `weights` are permyriad
    * (must sum to 10000), e.g. Seq("train"->8000,"val"->1000,
    * "test"->1000). */
  def splitAssign(id: Column, weights: Seq[(String, Int)],
                  salt: String = "graft"): Column = {
    require(weights.map(_._2).sum == 10000,
      s"split weights must sum to 10000, got $weights")
    val b = hashBucket(id, salt)
    val (expr, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, cum), (name, w)) =>
        (coalesce(acc, when(b < cum + w, name)), cum + w)
    }
    expr
  }

  /** Deterministic ~`permyriad`/10000 sample: keep iff bucket < rate.
    * Use a different salt than splitAssign so sampling is independent
    * of split membership. */
  def sampleHash(df: DataFrame, idCol: String, permyriad: Int,
                 salt: String = "sample"): DataFrame =
    df.where(hashBucket(col(idCol), salt) < permyriad)
}
