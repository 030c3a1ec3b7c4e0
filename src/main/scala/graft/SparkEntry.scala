package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in module files ([[Queries]], graft.llm.*) as [[Q]]
  * values pairing the Spark plan with its DuckDB oracle; this object just
  * flattens them into the driver's Map shape.
  */
object SparkEntry {

  /** Every registered query, in declaration order. */
  def all: Seq[Q] =
    Queries.relational ++ llm.LlmQueries.all ++ osm.OsmQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The flagship is the reference's flagship: a covering-pruned,
    * topology-complete regional extract. */
  def entry(spark: SparkSession): DataFrame =
    queries("q32_extract_complete")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
