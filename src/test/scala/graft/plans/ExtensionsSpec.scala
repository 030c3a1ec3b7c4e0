package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end test of the DEPLOYMENT wiring: a session built with
  * `.withExtensions(new GraftExtensions)` (the code path behind
  * `spark.sql.extensions=graft.functions.GraftExtensions`) must
  * resolve every custom function from pure SQL — scalar AND
  * aggregate — and run the region-rewrite optimizer rule, with NO
  * explicit `GraftFunctions.register` call. This is how a cluster
  * operator wires the library for SQL-only consumers; every other
  * suite exercises the per-session `register` path instead. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions registers functions and the region-rewrite " +
    "rule without register()") {
    // other suites' (finished) shared sessions must not satisfy
    // getOrCreate — extensions only apply to a NEWLY created session.
    // SAFETY: stopping the active session is only safe because
    // build.sbt runs test suites SEQUENTIALLY in one forked JVM
    // (Test / fork := true, no forked-parallel setting); if parallel
    // forked tests are ever enabled, this must move to an isolated
    // helper that builds its own session without touching the shared
    // one
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      // scalar expression + TypedImperativeAggregate from pure SQL
      val r = s.sql(
        """SELECT s2_cell_id(CAST(1.0 AS DOUBLE),
          |                  CAST(2.0 AS DOUBLE), 16) AS c,
          |       bitmap_cardinality(bitmap_agg(x)) AS n
          |FROM VALUES (CAST(1 AS BIGINT)), (2L), (2L) AS t(x)"""
          .stripMargin).head()
      assert(r.getLong(1) == 2L, "bitmap aggregate wrong cardinality")
      assert(r.getLong(0) ==
        graft.spatial.S2.latLngToCellId(1.0, 2.0, 16),
        "s2_cell_id disagrees with the library call")

      // optimizer rule injected: an exact region predicate over a
      // parquet scan gains the covering-range prune + exact residual
      import s.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ext").toString
      (0 until 2000).map { i =>
        (i.toLong, (i % 170).toDouble - 85, (i % 360).toDouble - 180)
      }.toDF("id", "lat", "lng").write.mode("overwrite").parquet(dir)
      val opt = s.read.parquet(dir)
        .where(expr(
          "st_within_region(lat, lng, '40.0,-75.0,42.0,-70.0', 'bbox')"))
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("cell_in_ranges"),
        s"region-rewrite rule not active via extensions:\n$opt")
      assert(opt.contains("st_within_region"), "exact residual missing")
    } finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
