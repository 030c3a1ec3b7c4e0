package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for q121 plan shape per SF (not registered). */
object ProbeQ121 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    for (d <- args) {
      val emb = graft.Queries.T(spark, d, "embeddings")
        .select($"vec_id", $"label",
          $"embedding".cast("array<double>").as("v"))
      val anch = emb.where($"vec_id" % 25 === 0 &&
          $"vec_id" < graft.llm.Similarity.MaxAnchorId)
        .select($"vec_id".as("anchor"), $"label".as("albl"),
          $"v".as("qv"))
      val est = anch.queryExecution.optimizedPlan.stats.sizeInBytes
      println(s"[probe] $d anch est = $est gate=${64L << 20} " +
        s"broadcast=${est <= (64L << 20)} n_anch=${anch.count()}")
      val q = graft.SparkEntry.queries("q121_triplet_mining")(spark, d)
      val plan = q.queryExecution.executedPlan.toString
      Seq("BroadcastNestedLoop", "CartesianProduct", "BroadcastHashJoin",
        "SortMergeJoin", "Window").foreach { m =>
        val c = m.r.findAllIn(plan).size
        if (c > 0) println(s"[probe] $d plan has $m x$c")
      }
    }
    spark.stop()
  }
}
