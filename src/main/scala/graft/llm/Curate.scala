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
}
