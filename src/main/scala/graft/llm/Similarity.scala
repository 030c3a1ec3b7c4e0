package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Scale design (100 TB):
  *   - the query vector is a tiny literal folded into the plan (the
  *     100 TB side streams map-side; no shuffle for scoring, one
  *     TakeOrdered for top-k);
  *   - all arithmetic is double with a sequential left-fold, so scores
  *     are deterministic and engine-portable;
  *   - the brute-force path is the exactness baseline; the LSH path
  *     (random-hyperplane signatures, bucketed join) is the scale path:
  *     it prunes candidates with ONE shuffle and re-scores only within
  *     buckets. Hyperplane components are md5-derived, so the "random"
  *     projection is deterministic across runs/engines — a re-index over
  *     new data lands in comparable buckets.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (doubles, deterministic fold order). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Brute-force top-k by cosine against a literal query vector.
    * Output: vec_id, score (rounded 6dp), rank. Deterministic tiebreak on
    * vec_id. Physical plan: map-side projection + TakeOrderedAndProject —
    * no full sort, no shuffle of the scored set. */
  def cosineTopK(embeddings: DataFrame, vecCol: String, idCol: String,
                 query: Seq[Double], k: Int): DataFrame = {
    val q = typedlit(query)
    val e = col(vecCol).cast("array<double>")
    embeddings
      .select(col(idCol).as("vec_id"),
        round(cosine(e, q), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component p_j in [-0.5, 0.5]:
    * derived from md5(plane:j), uniform by construction. */
  private def planeComponent(plane: Int, j: Column): Column =
    (conv(substring(md5(concat(lit(plane.toString), lit(":"),
      j.cast("string"))), 1, 6), 16, 10).cast("double")
      / lit(16777215.0)) - 0.5

  /** Random-hyperplane LSH signature: `planes` sign bits as a bit string.
    * Computed map-side from the embedding alone. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int): Column =
    concat_ws("", transform(sequence(lit(0), lit(planes - 1)), p => {
      val s = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, j) => acc + element_at(vec, j + 1).cast("double") *
          // inline per-plane component via md5(p:j)
          ((conv(substring(md5(concat(p.cast("string"), lit(":"),
            j.cast("string"))), 1, 6), 16, 10).cast("double")
            / lit(16777215.0)) - lit(0.5)))
      when(s >= 0, "1").otherwise("0")
    }))

  /** Approximate nearest neighbours of a literal query vector: candidates
    * share the query's hyperplane-signature bucket (or differ in <= 1 of
    * `planes` bits via banded prefix/suffix), re-scored exactly.
    * One shuffle-free scan + a filter on signature; a production variant
    * would pre-materialize the signature column and partition by it. */
  def annCosine(embeddings: DataFrame, vecCol: String, idCol: String,
                query: Seq[Double], k: Int, planes: Int = 8): DataFrame = {
    val dim = query.length
    val e = col(vecCol).cast("array<double>")
    val sig = hyperplaneSignature(e, dim, planes)
    // query signature computed driver-side with the same md5 derivation
    val qSig = (0 until planes).map { p =>
      val s = (0 until dim).map { j =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 6)
        query(j) * (java.lang.Long.parseLong(hex, 16).toDouble
          / 16777215.0 - 0.5)
      }.sum
      if (s >= 0) "1" else "0"
    }.mkString
    val half = planes / 2
    val q = typedlit(query)
    embeddings
      .select(col(idCol).as("vec_id"), e.as("v"), sig.as("sig"))
      // band the signature in two halves: candidates match either half
      .where(substring(col("sig"), 1, half) === qSig.substring(0, half) ||
        substring(col("sig"), half + 1, planes - half) ===
          qSig.substring(half))
      .select(col("vec_id"), round(cosine(col("v"), q), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label element-wise centroid of embeddings (posexplode ->
    * per-dimension exact DECIMAL mean -> ordered reassembly). The
    * explode shuffles (label, dim) keyed partial sums — fully parallel
    * and skew-free (dims spread the key space). */
  def centroids(embeddings: DataFrame, vecCol: String, labelCol: String)
  : DataFrame =
    embeddings
      .select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("decimal(27,12)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => round(e("m"), 6)).as("centroid"))
}
