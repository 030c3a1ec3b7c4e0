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

  /** The near-dup stage under one of two SEMANTIC MODES — `cacheKey`
    * is a mode switch, not a transparent cache:
    *
    *   - `Some(k)` (corpus-level, the production shape): read the
    *     CORPUS-LEVEL staged pair artifact (one LSH+verify pass per
    *     corpus snapshot serves every funnel — at sf10 the per-funnel
    *     duplicate pass was ~90% of q45's 203s) restricted to pairs
    *     whose BOTH endpoints survived exact dedup.
    *   - `None` (subset-level): run banding+verify fresh on exactly
    *     the rows given — self-contained, no artifact.
    *
    * The two modes can legitimately DIFFER when LSH bucket truncation
    * (maxBucket) is active: corpus-level banding truncates each
    * bucket against the whole corpus's membership, subset-level
    * against the subset's — so a pair dropped by corpus-level
    * crowding can surface in the subset pass and vice versa. Pick the
    * mode by what the duplicate relation should range over (dedup
    * "within this corpus" vs "within this slice"); don't treat the
    * switch as a pure performance knob. Both funnels (curate and
    * curateWithReport) share this selector, so the reported stage
    * counts always agree with the corresponding curate() output. */
  private def nearDupStage(exact: DataFrame, docs: DataFrame,
                           textCol: String, idCol: String,
                           threshold: Double,
                           cacheKey: Option[String]): DataFrame =
    cacheKey match {
      case Some(k) =>
        val pairs = Dedup.stagedNearDupPairs(docs, textCol, idCol, k,
          threshold)
        // the survivor-id frame is referenced twice under different
        // renames, and renamed subtrees defeat ReusedExchange (the
        // duplicatedSpans hazard): checkpoint the one-column id set so
        // the corpus-scale exact-dedup hash-agg runs once, not once
        // per probe
        val ids = exact.select(col(idCol)).localCheckpoint(eager = true)
        val dropped = pairs
          .join(ids.withColumnRenamed(idCol, "a"), Seq("a"), "left_semi")
          .join(ids.withColumnRenamed(idCol, "b"), Seq("b"), "left_semi")
          .select(col("b").as(idCol)).distinct()
        exact.join(dropped, Seq(idCol), "left_anti")
      case None =>
        Dedup.nearDupSurvivors(exact, textCol, idCol, threshold)
    }

  def curate(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id", minQuality: Double = 0.5,
             langs: Seq[String] = Seq("en"),
             nearDupThreshold: Double = 0.6,
             cacheKey: Option[String] = None): DataFrame = {
    val exact = Dedup.exactDedup(docs, textCol, idCol)
    val nearDup = nearDupStage(exact, docs, textCol, idCol,
      nearDupThreshold, cacheKey)
    nearDup
      .where(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .where(TextFunctions.langId(col(textCol))
        .isin(langs.map(l => l: Any): _*))
  }

  /** Same funnel with per-stage counts (each count is an action; use
    * for audits, not hot paths). Takes the same `cacheKey` mode switch
    * as [[curate]] and routes through the same stage selector, so the
    * report's counts describe exactly the curate() output for the
    * same arguments. */
  def curateWithReport(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       minQuality: Double = 0.5,
                       langs: Seq[String] = Seq("en"),
                       nearDupThreshold: Double = 0.6,
                       cacheKey: Option[String] = None)
  : (DataFrame, Report) = {
    val input = docs.count()
    val exact = Dedup.exactDedup(docs, textCol, idCol)
    val nExact = exact.count()
    val nearDup = nearDupStage(exact, docs, textCol, idCol,
      nearDupThreshold, cacheKey)
    val nNear = nearDup.count()
    val qual = nearDup
      .where(TextFunctions.qualityScore(col(textCol)) >= minQuality)
    val nQual = qual.count()
    val out = qual.where(TextFunctions.langId(col(textCol))
      .isin(langs.map(l => l: Any): _*))
    (out, Report(input, nExact, nNear, nQual, out.count()))
  }

  /** Per-doc benchmark-contamination scores: every `train` column plus
    * `n_sh` (doc shingle count), `n_shared` (shingles also in the
    * benchmark union), `contam_frac` (round 6). The benchmark shingle
    * union is bounded by the benchmark-suite size — NOT corpus-linear —
    * so broadcasting it is the honest 100 TB plan (PlanSpec asserts
    * it): the train side streams map-side through one broadcast
    * semi-join + one per-doc count shuffle. Shared by q63 (reporting)
    * and q100 stage 2 (filtering) so the two stay in lockstep. */
  def contaminationScores(train: DataFrame, bench: DataFrame,
                          textCol: String, idCol: String, ngram: Int)
  : DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // widen: both shingle passes are per-doc kernel work — see
    // ScanParallelism (single-file scans otherwise serialize them)
    val bs = graft.ops.ScanParallelism.widen(bench).select(explode(
        TextFunctions.ngramShingleHashes(col(textCol), ngram)).as("h"))
      .distinct()
    // coalesce: a NULL-text row must score n_sh = 0 (size(null) is -1
    // under Spark's default sizeOfNull — an impossible shingle count
    // that would read as "clean" downstream)
    val tr = graft.ops.ScanParallelism.widen(train).withColumn("sh",
      coalesce(TextFunctions.ngramShingleHashes(col(textCol), ngram),
        array().cast("array<bigint>")))
    val shared = tr.select(col(idCol), explode(col("sh")).as("h"))
      .join(broadcast(bs), "h")
      .groupBy(idCol).agg(count(lit(1)).as("ns"))
    tr.join(shared, Seq(idCol), "left")
      .withColumn("n_sh", size(col("sh")).cast("long"))
      .withColumn("n_shared", coalesce(col("ns"), lit(0L)))
      .withColumn("contam_frac",
        when(col("n_sh") > 0,
          round(col("n_shared").cast("double") / col("n_sh"), 6))
          .otherwise(lit(0.0)))
      .drop("sh", "ns")
  }

  /** Contamination HIT LIST (train docs sharing >= 1 shingle
    * occurrence with the benchmark) via a Bloom-prefiltered exact
    * join — the [[contaminationScores]] shape for when the benchmark
    * shingle union is bounded but too large to broadcast raw. The
    * benchmark side builds a ~10-bit/key Bloom filter (OR-merged
    * partials, one single-row shuffle of `numBits/8` bytes per map
    * task); the exploded train side is filtered MAP-SIDE by the
    * codegen'd `bloom_contains` probe BELOW the verify join's
    * exchange, so ~99% of train shingle occurrences never shuffle.
    * The verify join against the exact benchmark set then kills the
    * Bloom's false positives — the output is EXACT (oracle-equal to
    * the plain join) at any scale factor; only the shuffled volume is
    * probabilistic. At 100 TB, stage `bench`'s distinct shingles once
    * (it is scanned for the count, the filter build, and the verify). */
  def contaminationHitsBloom(train: DataFrame, bench: DataFrame,
                             textCol: String, idCol: String, ngram: Int,
                             forceBits: Option[Int] = None)
  : DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    val bs = bench.select(explode(
        TextFunctions.ngramShingleHashes(col(textCol), ngram)).as("h"))
      .distinct()
    val bits = forceBits.getOrElse(
      graft.functions.BloomImpl.suggestBits(bs.count()))
    val bloom = bs
      .agg(call_function("bloom_agg", col("h"), lit(bits), lit(7)))
      .head().getAs[Array[Byte]](0)
    // coalesce: a NULL-text row must score n_sh = 0 (size(null) is -1
    // under Spark's default sizeOfNull — an impossible shingle count
    // that would read as "clean" downstream). Not widened (r16 A/B:
    // q108 0.95x — the bloom probe drops most rows map-side, so the
    // extra exchange outweighs the kernel parallelism here)
    val tr = train.withColumn("sh",
      coalesce(TextFunctions.ngramShingleHashes(col(textCol), ngram),
        array().cast("array<bigint>")))
    val shared = tr.select(col(idCol), explode(col("sh")).as("h"))
      .where(call_function("bloom_contains", lit(bloom), col("h")))
      .join(bs, "h") // exact verify: false positives die here
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    tr.join(shared, Seq(idCol)) // inner: hit list only
      .withColumn("n_sh", size(col("sh")).cast("long"))
      .withColumn("contaminated",
        round(col("n_shared").cast("double") / col("n_sh"), 6) >= 0.5)
      .select(col(idCol), col("n_sh"), col("n_shared"),
        col("contaminated"))
  }

  /** Corpus-wide heavy-hitter word n-grams (exact counts >= `minCount`)
    * via a count-min-sketch prefilter — the two-pass heavy-hitter
    * pattern for key spaces too wide to exact-count in one shuffle.
    * Pass 1 aggregates every n-gram occurrence's hash into a CMS
    * (partials ADD elementwise; the single-row shuffle carries sketch
    * bytes, never keys). Pass 2 re-scans occurrences, drops those whose
    * sketch estimate is already below `minCount` MAP-SIDE below the
    * exact count's exchange, and exact-counts only the survivors. CMS
    * never undercounts, so the candidate set is a SUPERSET of the true
    * heavy hitters and the final `HAVING count >= minCount` output is
    * EXACT at any scale factor — only the shuffled volume is
    * probabilistic (collisions admit some light keys; they die at the
    * exact count). At 100 TB, stage the tokenized occurrence stream
    * once (both passes scan it); the internal hash is engine-local
    * (xxhash64) and never oracle-visible. */
  def heavyHitterNgrams(docs: DataFrame, textCol: String, n: Int,
                        minCount: Long, width: Int = 1 << 14,
                        depth: Int = 4): DataFrame = {
    val s = docs.sparkSession
    graft.functions.GraftFunctions.register(s)
    // native gram kernel: the interpreted transform/concat_ws lambda
    // measured ~13.5s of q110's 46s at sf0.1 — ngram_join runs the
    // same join loop inside whole-stage codegen
    val grams = docs
      .select(TextFunctions.tokens(col(textCol)).as("t"))
      .select(explode(call_function("ngram_join", col("t"), lit(n)))
        .as("gram"))
    // Stage the tokenize -> n-gram -> explode stream ONCE: both passes
    // scan it, and re-running the gram build per pass measured as the
    // suite's slowest row (round-7 q110, 46s — 2x tokenize + explode).
    // The CMS pass prunes to just `h` (columnar read); the exact pass
    // reads (gram, h). At 100 TB this artifact is the materialize-once
    // occurrence table the Scaladoc prescribes.
    val occDir = graft.TempDirs.create("graft-cms-occ")
    grams.withColumn("h", xxhash64(col("gram")))
      .write.mode("overwrite").parquet(occDir)
    // explicit schema: an empty corpus writes no files (q100 rule)
    val occ = s.read.schema("gram STRING, h BIGINT").parquet(occDir)
    val cms = occ
      .agg(call_function("cms_agg", col("h"), lit(width), lit(depth)))
      .head().getAs[Array[Byte]](0)
    occ
      .where(call_function("cms_estimate", lit(cms), col("h")) >= minCount)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }

  /** `train` rows whose benchmark shared-shingle fraction is below
    * `threshold` (the decontamination filter itself). */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, ngram: Int,
                    threshold: Double): DataFrame =
    contaminationScores(train, bench, textCol, idCol, ngram)
      .where(col("contam_frac") < threshold)
      .drop("n_sh", "n_shared", "contam_frac")

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

  /** Weighted corpus mixing: re-weight each source to `weights(source)`
    * expected epochs per document (0.35 = keep 35%; 2.5 = two full
    * copies plus a 50% chance of a third). The integer part duplicates
    * every row (an `epoch` column 1..n disambiguates the copies — a
    * downstream shuffle spreads them); the fractional part is decided
    * per document by the same md5 permyriad bucket as [[hashBucket]],
    * so the mix is exactly reproducible under any partitioning and
    * stable under incremental recuration. Sources absent from
    * `weights` default to 1.0 (pass 0.0 to drop). Pure map-side +
    * one generator — no RNG, no shuffle. */
  def mixCorpus(docs: DataFrame, idCol: String, sourceCol: String,
                weights: Map[String, Double],
                salt: String = "mix"): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w < 100),
      s"mix weights must be in [0, 100), got $weights")
    val w = weights.foldLeft(lit(1.0)) { case (acc, (src, wt)) =>
      when(col(sourceCol) === src, lit(wt)).otherwise(acc)
    }
    val whole = floor(w).cast("long")
    val fracPermyriad = round((w - floor(w)) * 10000).cast("long")
    val copies = whole +
      when(hashBucket(col(idCol), salt) < fracPermyriad, 1L)
        .otherwise(0L)
    docs.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Exclusive prefix sum of `tokCol` in global `idCol` order — the
    * building block of sequence packing — as a SCALABLE two-phase scan
    * rather than a single global window (which Spark executes on ONE
    * partition: a non-starter at corpus scale). Phase 1 range-partitions
    * by id and computes per-partition token sums (rows proportional to
    * the partition count, not the corpus — same class as an IVF
    * centroid collect); phase 2 turns their running totals into a
    * literal pid->offset map and adds a WITHIN-partition running sum.
    * Range boundaries may vary run to run, but `start` depends only on
    * the global id order, so the output is deterministic.
    *
    * Returns (idCol, tok, start) with start = sum of all earlier docs'
    * tok. */
  def tokenStarts(docs: DataFrame, idCol: String, tokCol: Column,
                  numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val nPart = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val toks = docs
      .select(col(idCol), tokCol.cast("long").as("tok"))
      .repartitionByRange(nPart, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      // eager checkpoint: phase 1's collect and phase 2's window read
      // the SAME materialized partitioning (re-executing the range
      // exchange could place boundaries differently between phases);
      // the between-query sweep reclaims the blocks
      .localCheckpoint(true)
    val sums = toks.groupBy("__pid")
      .agg(sum("tok").as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.map(_._1)
      .zip(sums.map(_._2).scanLeft(0L)(_ + _))
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(
        map(offsets.flatMap { case (p, o) =>
          Seq(lit(p), lit(o)) }: _*), col("__pid")), lit(0L))
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.withColumn("start",
        coalesce(sum(col("tok")).over(w), lit(0L)) + offCol)
      .drop("__pid")
  }

  /** Sequence packing: lay the corpus's token stream end-to-end in
    * `idCol` order (each document contributes `tokCol` tokens) and cut
    * it into fixed `seqLen`-token training windows, documents spanning
    * a boundary split across both windows (the GPT-style pack-and-slice
    * scheme). Emits the packing manifest: one row per (sequence,
    * document) overlap with the token count the document contributes to
    * that sequence. Built on [[tokenStarts]], so the scan scales. */
  def packSequences(docs: DataFrame, idCol: String, tokCol: Column,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val L = lit(seqLen.toLong)
    tokenStarts(docs, idCol, tokCol)
      .where(col("tok") > 0)
      .withColumn("seq_id",
        explode(sequence(floor(col("start") / L).cast("long"),
          floor((col("start") + col("tok") - 1) / L).cast("long"))))
      .select(col("seq_id"), col(idCol),
        (least(col("start") + col("tok"), (col("seq_id") + 1) * L) -
          greatest(col("start"), col("seq_id") * L)).as("n_tokens"))
  }
}
