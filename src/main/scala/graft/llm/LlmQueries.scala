package graft.llm

import org.apache.spark.sql.functions._
import graft.Q
import graft.Queries.T

/** Training-data-pipeline queries over `documents` and `embeddings`,
  * each with a DuckDB oracle implementing the SAME deterministic
  * algorithm (md5-based hashing, sequential folds, 6-dp rounding).
  */
object LlmQueries {

  /** DuckDB fragment: lowercase whitespace tokens, empty-free. */
  private val dTokens =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'),
      | t -> t != '')""".stripMargin

  private val P = TextFunctions.MinhashPrime

  /** DuckDB fragment: per-token 32-bit md5-prefix hashes mod P
    * (mirrors [[TextFunctions.tokenHash32]]). */
  private val dHashes =
    s"""list_transform($dTokens, t ->
       |  (CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % $P))"""
      .stripMargin

  /** DuckDB fragment: minhash signature as a BIGINT list — same affine
    * permutations as [[TextFunctions.minhashSignature]] (coefficients
    * inlined as identical literals). Expects a CTE column `h` holding
    * [[dHashes]]. */
  private val dSig: String =
    TextFunctions.minhashCoeffs(16).map { case (a, b) =>
      s"list_min(list_transform(h, x -> ($a * x + $b) % $P))"
    }.mkString("[", ",\n  ", "]")

  /** Stage `docs` (doc_id, text) as an nb-file parquet feed for the
    * streaming queries: ascending doc_id ranges with strictly
    * ascending mtimes, so `maxFilesPerTrigger=1` replays the corpus in
    * id order. q104's first-seen-wins compare needs that order (the
    * batch holding a fingerprint's minimal id must arrive first);
    * q105's pair-set compare is order-invariant but shares the feed. */
  private[graft] def stageFileFeed(docs: org.apache.spark.sql.DataFrame,
                            nb: Long): String = {
    import org.apache.spark.sql.functions.{col, max => smax}
    val maxIdRow = docs.agg(smax(col("doc_id"))).head()
    if (maxIdRow.isNullAt(0)) throw new IllegalArgumentException(
      "stageFileFeed: empty corpus — nothing to stage as a stream feed")
    val maxId = maxIdRow.getLong(0)
    val span = maxId / nb + 1L
    graft.streaming.FeedStage.stageBatches((0L until nb).map { k =>
      docs.where(col("doc_id") >= k * span &&
        col("doc_id") < (k + 1) * span)
    })
  }

  /** DuckDB fragment: 64-bit simhash bit string from a CTE column `h`
    * of per-token md5 hex strings (mirrors
    * [[graft.functions.TextHashImpl.simhash64]], incl. the zero-token
    * all-zeros case). */
  private val dSimhashExpr: String =
    """CASE WHEN len(h) = 0 THEN repeat('0', 64)
      |  ELSE array_to_string(
      |    list_transform(generate_series(0, 63), j ->
      |      CASE WHEN list_sum(list_transform(h, x ->
      |        2 * (((strpos('0123456789abcdef',
      |                 x[CAST(j // 4 AS INT) + 1
      |                   : CAST(j // 4 AS INT) + 1]) - 1)
      |              >> CAST(j % 4 AS INT)) & 1) - 1)) >= 0
      |      THEN '1' ELSE '0' END), '')
      |  END""".stripMargin

  /** The engine's LSH bucket-truncation cap, mirrored into every
    * oracle so engine and oracle cap IDENTICALLY at any scale factor
    * (at the sf0.01 gate no bucket reaches it; at sf1 one degenerate
    * bucket family would otherwise emit 1e9 uncapped pairs). */
  private val dMaxBucket = graft.llm.Dedup.DefaultMaxBucket

  /** DuckDB CTE prelude shared by the minhash queries: token hashes,
    * signatures (token-bearing docs only), per-band bucket keys, and
    * each doc's id-rank within its (band, bucket) — the oracle twin of
    * the engine's smallest-id bucket truncation.
    * `src` is the doc table/CTE (needs doc_id + text columns). */
  private def dBandCtesFrom(src: String): String =
    s"""hs AS (SELECT doc_id, $dHashes AS h FROM $src),
       |sig AS (SELECT doc_id, $dSig AS sig FROM hs WHERE len(h) > 0),
       |bands AS (
       |  SELECT doc_id, b,
       |         md5(array_to_string(sig[b*4+1 : b*4+4], '|')) AS bkey
       |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) bs),
       |ranked AS (
       |  SELECT doc_id, b, bkey,
       |         row_number() OVER (PARTITION BY b, bkey
       |                            ORDER BY doc_id) AS rk
       |  FROM bands)"""
      .stripMargin

  /** Batch candidate-pair CTEs: `cand` is the EXACT batch-engine rule —
    * a pair is a candidate iff BOTH members are within the first
    * `dMaxBucket` ids of the bucket at the pair's FIRST colliding band
    * (`Dedup.minhashCandidatePairs`: truncated membership, first-band
    * dedup on full signatures). Where no bucket exceeds the cap this
    * reduces to the plain DISTINCT band self-join. */
  private def dCandidateCtesFrom(src: String): String =
    s"""${dBandCtesFrom(src)},
       |fb AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, min(x.b) AS fband
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id),
       |cand AS (
       |  SELECT f.a, f.b FROM fb f
       |  JOIN ranked ra ON ra.doc_id = f.a AND ra.b = f.fband
       |  JOIN ranked rb ON rb.doc_id = f.b AND rb.b = f.fband
       |  WHERE ra.rk <= $dMaxBucket AND rb.rk <= $dMaxBucket)"""
      .stripMargin

  private val dCandidateCtes = dCandidateCtesFrom("documents")

  /** DuckDB fragment: the quality-feature SELECT body (doc_id + the
    * four raw counts; append `FROM <src>`). Mirrors
    * [[TextFunctions.qualityScore]]'s inputs. */
  private val dQualityFeatures: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS DOUBLE) AS nc,
       |  CAST(len($dTokens) AS DOUBLE) AS nw,
       |  CAST(length(text) - length(regexp_replace(text,
       |       '[[:punct:]]', '', 'g')) AS DOUBLE) AS np,
       |  CAST(length(text) - length(regexp_replace(text,
       |       '[A-Z]', '', 'g')) AS DOUBLE) AS nu""".stripMargin

  /** DuckDB fragment: the composite quality score over
    * [[dQualityFeatures]] columns (rounded 6dp). */
  private val dQualityExpr: String =
    """round(
      |  least(nc / 200.0, 1.0) * 0.3 +
      |  (CASE WHEN nw > 0 AND nc / nw >= 3 AND nc / nw <= 12
      |        THEN 1.0 ELSE 0.5 END) * 0.2 +
      |  (1.0 - least(np / greatest(nc, 1.0) * 4.0, 1.0)) * 0.3 +
      |  (1.0 - least(nu / greatest(nc, 1.0) * 2.0, 1.0)) * 0.2,
      |  6)""".stripMargin

  /** DuckDB fragment: stopword-hit count for language `l` (mirrors
    * [[TextFunctions.stopwordHits]]). */
  private def dHits(l: String): String = {
    val words = TextFunctions.stopwords(l)
      .map(w => s"'$w'").mkString(", ")
    s"len(list_filter($dTokens, t -> list_contains([$words], t)))"
  }

  /** DuckDB fragment: distinct 48-bit md5 hashes of the n-char shingles
    * of normalized `text` (mirrors
    * [[TextFunctions.ngramShingleHashes]]). */
  private def dShinglesN(n: Int): String =
    s"""CASE WHEN length(regexp_replace(lower(trim(text)),
       |                 '\\s+', ' ', 'g')) >= $n
       |THEN list_distinct(list_transform(
       |  generate_series(1, length(regexp_replace(lower(trim(text)),
       |                  '\\s+', ' ', 'g')) - ${n - 1}),
       |  i -> CAST(concat('0x', substr(md5(
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
       |      [CAST(i AS INT) : CAST(i AS INT) + ${n - 1}]), 1, 12))
       |    AS BIGINT)))
       |ELSE [] END""".stripMargin

  private val dShingles3: String = dShinglesN(3)

  /** Shared verify-stage oracle tail over `cand` (append after
    * [[dCandidateCtesFrom]]): hashed shingles, pair scoring, and the
    * verified-pair set `p` — threshold-rounded exactly like the
    * engine's staged artifact. Single source of truth for the
    * staged-artifact consumer oracles (q162/q166/q170/q172/q174/
    * q176), so a change to the verify rule cannot silently desync
    * them. */
  private def dVerifiedPairCtes(threshold: Double): String =
    s"""sh AS (SELECT doc_id, $dShingles3 AS sh
       |  FROM documents),
       |scored AS (
       |  SELECT c.a, c.b,
       |         len(x.sh) + len(y.sh) AS st,
       |         len(list_distinct(list_concat(x.sh, y.sh)))
       |           AS un
       |  FROM cand c JOIN sh x ON x.doc_id = c.a
       |              JOIN sh y ON y.doc_id = c.b),
       |p AS (SELECT a, b,
       |  round(CASE WHEN un = 0 THEN 0.0
       |        ELSE CAST(st - un AS DOUBLE) / un END, 6)
       |    AS jaccard
       |  FROM scored
       |  WHERE round(CASE WHEN un = 0 THEN 0.0
       |        ELSE CAST(st - un AS DOUBLE) / un END, 6)
       |        >= $threshold)""".stripMargin

  /** Hashed-shingle CTE (`sh`) + verified near-dup drop set (`dropped`)
    * over `src` at `threshold` — the q27/q44 pipeline pieces. */
  private def dNearDupDropCtes(src: String, threshold: Double): String =
    s"""sh AS (SELECT doc_id, $dShingles3 AS sh
       |  FROM $src),
       |scored AS (
       |  SELECT c.a, c.b,
       |         len(x.sh) + len(y.sh) AS st,
       |         len(list_distinct(list_concat(x.sh, y.sh))) AS un
       |  FROM cand c JOIN sh x ON x.doc_id = c.a
       |              JOIN sh y ON y.doc_id = c.b),
       |dropped AS (
       |  SELECT DISTINCT b FROM scored
       |  WHERE round(CASE WHEN un = 0 THEN 0.0
       |        ELSE CAST(st - un AS DOUBLE) / un END, 6) >= $threshold)"""
      .stripMargin

  val all: Seq[Q] = Seq(

    // ---- exact dedup by content fingerprint ----
    Q("q20_dedup_exact",
      (s, d) => {
        import s.implicits._
        Dedup.exactGroups(T(s, d, "documents"), "text", "doc_id")
          .orderBy($"fingerprint")
      },
      Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |         AS fingerprint,
             |       min(doc_id) AS keep_id, count(*) AS n_dups
             |FROM documents GROUP BY 1
             |ORDER BY fingerprint""".stripMargin)),

    // ---- winnowing fingerprint (the MOSS rolling-hash algorithm):
    // positional char-8-gram hashes, window-4 minima, sorted distinct.
    // Native one-pass expression; oracle recomputes the identical
    // selection with list lambdas over the same md5-48bit hashes ----
    Q("q51_winnow_fingerprint",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents").select($"doc_id",
          call_function("winnow_fingerprint",
            TextFunctions.normalize($"text"), lit(8), lit(4)).as("fps"))
          // The verify harness hash-compares rows in pandas, which cannot
          // hash ndarray cells — emit the fingerprint set as a '|'-joined
          // string on both engines (empty array -> "").
          .select($"doc_id",
            concat_ws("|", $"fps".cast("array<string>")).as("fps"),
            size($"fps").cast("long").as("n_fp"))
          .orderBy($"doc_id")
      },
      Some("""WITH norm AS (
             |  SELECT doc_id,
             |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
             |  FROM documents),
             |seqs AS (
             |  SELECT doc_id,
             |    CASE WHEN length(t) < 8 THEN CAST([] AS BIGINT[])
             |    ELSE list_transform(generate_series(1, length(t) - 7),
             |      i -> CAST(concat('0x',
             |        substr(md5(substr(t, CAST(i AS INT), 8)), 1, 12))
             |        AS BIGINT))
             |    END AS seq
             |  FROM norm),
             |wins AS (
             |  SELECT doc_id,
             |    CASE WHEN len(seq) = 0 THEN CAST([] AS BIGINT[])
             |    ELSE list_transform(
             |      generate_series(1, greatest(len(seq) - 3, 1)), j ->
             |        list_min(list_filter(
             |          list_transform(generate_series(0, 3), o ->
             |            seq[CAST(j + o AS INT)]),
             |          x -> x IS NOT NULL)))
             |    END AS mins
             |  FROM seqs)
             |SELECT doc_id,
             |  coalesce(array_to_string(
             |    list_sort(list_distinct(mins)), '|'), '') AS fps,
             |  len(list_distinct(mins)) AS n_fp
             |FROM wins ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- token counting: whitespace + BPE-ish regex ----
    Q("q21_token_counts",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents").select($"doc_id",
          TextFunctions.tokenCountWs($"text").cast("long").as("n_ws"),
          TextFunctions.tokenCountRegex($"text").cast("long").as("n_bpe"),
          length($"text").cast("long").as("n_chars_m"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  len($dTokens) AS n_ws,
              |  len(regexp_extract_all(text,
              |      '[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]+')) AS n_bpe,
              |  length(text) AS n_chars_m
              |FROM documents ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- heuristic quality scoring ----
    Q("q22_quality_scores",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents").select($"doc_id",
          TextFunctions.qualityScore($"text").as("quality"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH f AS ($dQualityFeatures FROM documents)
              |SELECT doc_id, $dQualityExpr AS quality
              |FROM f ORDER BY doc_id""".stripMargin)),

    // ---- language ID by stopword argmax, scored against truth ----
    Q("q23_langid",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents").select($"doc_id", $"lang",
          TextFunctions.langId($"text").as("pred"))
          .orderBy($"doc_id")
      },
      Some {
        s"""WITH h AS (SELECT doc_id, lang,
           |  ${dHits("en")} AS e, ${dHits("de")} AS g,
           |  ${dHits("fr")} AS f, ${dHits("es")} AS sp
           |  FROM documents)
           |SELECT doc_id, lang,
           |  CASE WHEN e <= 0 AND g <= 0 AND f <= 0 AND sp <= 0 THEN 'und'
           |       WHEN e >= g AND e >= f AND e >= sp THEN 'en'
           |       WHEN g >= f AND g >= sp THEN 'de'
           |       WHEN f >= sp THEN 'fr'
           |       ELSE 'es' END AS pred
           |FROM h ORDER BY doc_id""".stripMargin
      }),

    // ---- minhash signatures (map-side, zero shuffle) ----
    Q("q24_minhash_signature",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents").select($"doc_id",
          concat_ws("|", transform(
            TextFunctions.minhashSignature($"text", 16),
            v => v.cast("string"))).as("sig"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH hs AS (SELECT doc_id, $dHashes AS h FROM documents)
              |SELECT doc_id, array_to_string($dSig, '|') AS sig
              |FROM hs ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- LSH banding -> candidate near-dup pairs ----
    Q("q25_minhash_pairs",
      (s, d) => {
        import s.implicits._
        Dedup.stagedCandidatePairs(T(s, d, "documents"), "text", "doc_id",
          cacheKey = d)
          .orderBy($"a", $"b")
      },
      Some(s"""WITH $dCandidateCtes
              |SELECT a, b FROM cand ORDER BY a, b""".stripMargin)),

    // ---- simhash sketches ----
    Q("q26_simhash",
      (s, d) => {
        import s.implicits._
        Dedup.simhashSketch(T(s, d, "documents"), "text", "doc_id")
          .orderBy($"doc_id")
      },
      Some(s"""WITH hs AS (SELECT doc_id,
              |  list_transform($dTokens, t -> md5(t)) AS h
              |  FROM documents)
              |SELECT doc_id, $dSimhashExpr AS simhash
              |FROM hs ORDER BY doc_id""".stripMargin)),

    // ---- SimHash 4x16-bit banding -> candidate pairs (pigeonhole:
    // Hamming distance <= 3 always collides in >= 1 band).
    // SCALE NOTE: kept for surface fidelity via the EXPLICIT legacy
    // entry point (since r12 the default simhashCandidatePairs is the
    // Manku block-permutation banding, q203); the 4x16 key space is
    // fixed (262144 keys), so buckets saturate as the corpus grows —
    // q200_simhash_scalable is the non-saturating production path
    // (20 block-triple bands, ~2^32 keys each, exact Hamming verify) ----
    Q("q41_simhash_bands",
      (s, d) => {
        import s.implicits._
        Dedup.simhashCandidatePairs4x16(T(s, d, "documents"), "text",
          "doc_id").orderBy($"a", $"b")
      },
      Some(s"""WITH hs AS (SELECT doc_id,
              |  list_transform($dTokens, t -> md5(t)) AS h
              |  FROM documents),
              |sk AS (SELECT doc_id, $dSimhashExpr AS sh FROM hs),
              |bands AS (
              |  SELECT doc_id, b, substr(sh, b*16 + 1, 16) AS bkey
              |  FROM sk, (SELECT unnest(generate_series(0, 3)) AS b) bs),
              |rkd AS (
              |  SELECT doc_id, b, bkey,
              |         row_number() OVER (PARTITION BY b, bkey
              |                            ORDER BY doc_id) AS rk
              |  FROM bands)
              |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              |FROM rkd x JOIN rkd y
              |  ON x.b = y.b AND x.bkey = y.bkey
              | AND x.doc_id < y.doc_id
              | AND x.rk <= $dMaxBucket AND y.rk <= $dMaxBucket
              |ORDER BY a, b""".stripMargin)),

    // ---- n-gram Jaccard near-dups: LSH candidates -> exact verify ----
    // The scale-safe shape (one bucketed shuffle + per-candidate verify)
    // replacing the r1/r2 all-pairs-within-block join that was quadratic
    // in block size (the r2 verdict's top perf item).
    Q("q27_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        Dedup.stagedNearDupPairs(T(s, d, "documents"), "text", "doc_id",
          cacheKey = d, threshold = 0.5, ngram = 3)
          .orderBy($"a", $"b")
      },
      Some(s"""WITH $dCandidateCtes,
              |sh AS (SELECT doc_id,
              |  CASE WHEN length(regexp_replace(lower(trim(text)),
              |                   '\\s+', ' ', 'g')) >= 3
              |  THEN list_distinct(list_transform(
              |    generate_series(1, length(regexp_replace(lower(trim(text)),
              |                    '\\s+', ' ', 'g')) - 2),
              |    i -> CAST(concat('0x', substr(md5(
              |      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
              |        [CAST(i AS INT) : CAST(i AS INT) + 2]), 1, 12))
              |      AS BIGINT)))
              |  ELSE [] END AS sh
              |  FROM documents),
              |scored AS (
              |  SELECT c.a, c.b,
              |         len(x.sh) + len(y.sh) AS st,
              |         len(list_distinct(list_concat(x.sh, y.sh))) AS un
              |  FROM cand c JOIN sh x ON x.doc_id = c.a
              |              JOIN sh y ON y.doc_id = c.b)
              |SELECT a, b,
              |  round(CASE WHEN un = 0 THEN 0.0
              |        ELSE CAST(st - un AS DOUBLE) / un END, 6) AS jaccard
              |FROM scored
              |WHERE round(CASE WHEN un = 0 THEN 0.0
              |      ELSE CAST(st - un AS DOUBLE) / un END, 6) >= 0.5
              |ORDER BY a, b""".stripMargin),
      bench = true),

    // ---- brute-force cosine top-k (exactness baseline for ANN) ----
    Q("q28_cosine_topk",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
        val query = emb.where($"vec_id" === 0L)
          .select($"embedding".cast("array<double>")).head()
          .getSeq[Double](0)
        Similarity.cosineTopK(emb, "embedding", "vec_id", query, 20)
      },
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             |           FROM embeddings WHERE vec_id = 0),
             |sc AS (SELECT vec_id,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             |    * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(embedding, x ->
             |    CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM embeddings, q)
             |SELECT vec_id,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |FROM sc
             |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin),
      bench = true),

    // ---- ANN over a materialized hyperplane-signature index: bucket
    // filter (both signature halves) + exact rescore. The plane matrix
    // is a driver-computed literal (no per-row hashing); the oracle
    // re-derives identical signatures from the same inlined literals ----
    Q("q34_ann",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
        val query = emb.where($"vec_id" === 0L)
          .select($"embedding".cast("array<double>")).head()
          .getSeq[Double](0)
        val index = Similarity.annIndex(emb, "embedding", "vec_id", 64, 8)
        Similarity.annTopK(index, query, 20, 8)
      },
      Some {
        val m = Similarity.planeMatrix(8, 64)
        val mLit = m.map(_.mkString("[", ", ", "]"))
          .mkString("[", ",\n    ", "]")
        s"""WITH pm AS (SELECT $mLit AS m),
           |sig AS (
           |  SELECT vec_id, embedding, array_to_string(
           |    list_transform(generate_series(1, 8), p ->
           |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
           |        j -> CAST(embedding[CAST(j AS INT)] AS DOUBLE)
           |             * m[CAST(p AS INT)][CAST(j AS INT)])) >= 0
           |      THEN '1' ELSE '0' END), '') AS sig
           |  FROM embeddings, pm),
           |q AS (
           |  SELECT CAST(embedding AS DOUBLE[]) AS qv, sig AS qsig
           |  FROM sig WHERE vec_id = 0),
           |cand AS (
           |  SELECT s.vec_id, s.embedding FROM sig s, q
           |  WHERE substr(s.sig, 1, 4) = substr(q.qsig, 1, 4)
           |     OR substr(s.sig, 5, 4) = substr(q.qsig, 5, 4)),
           |sc AS (
           |  SELECT vec_id,
           |    list_sum(list_transform(generate_series(1, 64), j ->
           |      CAST(embedding[CAST(j AS INT)] AS DOUBLE)
           |      * qv[CAST(j AS INT)])) AS dt,
           |    sqrt(list_sum(list_transform(embedding, x ->
           |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
           |    sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
           |  FROM cand, q)
           |SELECT vec_id,
           |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
           |        ELSE dt / (nv * nq) END, 6) AS score
           |FROM sc ORDER BY score DESC, vec_id LIMIT 20""".stripMargin
      },
      bench = true),

    // ---- IVF-flat ANN: the coarse-quantizer scale path next to q34's
    // hyperplane index. Deterministic centroids (every 37th vector),
    // map-side literal-matrix assignment (no shuffle), driver-side
    // nprobe=4 probe with identical fold arithmetic, exact rescore of
    // only the probed centroids' lists. Stored partitionBy(centroid),
    // a probe is an nprobe-partition pruned scan ----
    Q("q49_ivf_ann",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
        val query = emb.where($"vec_id" === 0L)
          .select($"embedding".cast("array<double>")).head()
          .getSeq[Double](0)
        val cents = Similarity.ivfCentroids(emb, "embedding", "vec_id",
          every = 37)
        val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id",
          cents)
        Similarity.ivfTopK(assigned, query, cents, k = 20, nprobe = 4)
      },
      Some("""WITH cents AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id % 37 = 0 AND vec_id < 5000),
             |pairs AS (
             |  SELECT e.vec_id, e.embedding, c.cidx,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      c.cv[CAST(j AS INT)]
             |      * CAST(e.embedding[CAST(j AS INT)] AS DOUBLE))) AS dt,
             |    sqrt(list_sum(list_transform(c.cv, x -> x * x))) AS nc,
             |    sqrt(list_sum(list_transform(e.embedding, x ->
             |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne
             |  FROM embeddings e, cents c),
             |assign AS (
             |  SELECT vec_id, embedding, cidx,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY
             |      (CASE WHEN nc = 0 OR ne = 0 THEN 0
             |            ELSE dt / (nc * ne) END) DESC, cidx ASC) AS rk
             |  FROM pairs),
             |a1 AS (
             |  SELECT vec_id, embedding, cidx FROM assign WHERE rk = 1),
             |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             |      FROM embeddings WHERE vec_id = 0),
             |probe AS (
             |  SELECT cidx, row_number() OVER (ORDER BY
             |    (CASE WHEN nc = 0 OR nq = 0 THEN 0
             |          ELSE dt / (nc * nq) END) DESC, cidx ASC) AS rk
             |  FROM (
             |    SELECT c.cidx,
             |      list_sum(list_transform(generate_series(1, 64), j ->
             |        c.cv[CAST(j AS INT)] * qv[CAST(j AS INT)])) AS dt,
             |      sqrt(list_sum(list_transform(c.cv, x -> x * x)))
             |        AS nc,
             |      sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |    FROM cents c, q) p),
             |probed AS (SELECT cidx FROM probe WHERE rk <= 4),
             |cand AS (
             |  SELECT a1.vec_id, a1.embedding
             |  FROM a1 JOIN probed USING (cidx)),
             |sc AS (
             |  SELECT vec_id,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      CAST(embedding[CAST(j AS INT)] AS DOUBLE)
             |      * qv[CAST(j AS INT)])) AS dt,
             |    sqrt(list_sum(list_transform(embedding, x ->
             |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
             |    sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM cand, q)
             |SELECT vec_id,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |FROM sc ORDER BY score DESC, vec_id LIMIT 20""".stripMargin),
      bench = true),

    // ---- embedding-cosine near-dup pairs: signature-bucket candidates
    // -> exact cosine verify (the vector flavor of minhash dedup). The
    // testdata has no true near-dups (max pairwise cosine ~0.51), so
    // the threshold is set low to exercise the full pipeline; the
    // planted-duplicate semantics are unit-tested in LlmSpec ----
    Q("q42_embedding_neardup",
      (s, d) => {
        import s.implicits._
        Similarity.embeddingNearDuplicates(T(s, d, "embeddings"),
          "embedding", "vec_id", dim = 64, threshold = 0.25)
          .orderBy($"a", $"b")
      },
      Some {
        val m = Similarity.planeMatrix(8, 64)
        val mLit = m.map(_.mkString("[", ", ", "]"))
          .mkString("[", ",\n    ", "]")
        s"""WITH pm AS (SELECT $mLit AS m),
           |sig AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |    array_to_string(
           |    list_transform(generate_series(1, 8), p ->
           |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
           |        j -> CAST(embedding[CAST(j AS INT)] AS DOUBLE)
           |             * m[CAST(p AS INT)][CAST(j AS INT)])) >= 0
           |      THEN '1' ELSE '0' END), '') AS sig
           |  FROM embeddings, pm),
           |rkd AS (
           |  SELECT vec_id, v, sig,
           |         row_number() OVER (PARTITION BY sig
           |                            ORDER BY vec_id) AS rk
           |  FROM sig),
           |cand AS (
           |  SELECT x.vec_id AS a, y.vec_id AS b, x.v AS va, y.v AS vb
           |  FROM rkd x JOIN rkd y
           |    ON x.sig = y.sig AND x.vec_id < y.vec_id
           |   AND x.rk <= 10000 AND y.rk <= 10000),
           |sc AS (
           |  SELECT a, b,
           |    list_sum(list_transform(generate_series(1, 64), j ->
           |      va[CAST(j AS INT)] * vb[CAST(j AS INT)])) AS dt,
           |    sqrt(list_sum(list_transform(va, x -> x * x))) AS na,
           |    sqrt(list_sum(list_transform(vb, x -> x * x))) AS nb
           |  FROM cand)
           |SELECT a, b,
           |  round(CASE WHEN na = 0 OR nb = 0 THEN 0
           |        ELSE dt / (na * nb) END, 6) AS score
           |FROM sc
           |WHERE round(CASE WHEN na = 0 OR nb = 0 THEN 0
           |      ELSE dt / (na * nb) END, 6) >= 0.25
           |ORDER BY a, b""".stripMargin
      }),

    // ---- near-dup survivors: the curation step (drop every doc that
    // is the higher id of a verified near-dup pair) ----
    Q("q44_dedup_survivors",
      (s, d) => {
        import s.implicits._
        Dedup.nearDupSurvivors(T(s, d, "documents"), "text", "doc_id",
          threshold = 0.5, ngram = 3, cacheKey = Some(d))
          .select($"doc_id", $"lang", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $dCandidateCtes,
              |sh AS (SELECT doc_id,
              |  CASE WHEN length(regexp_replace(lower(trim(text)),
              |                   '\\s+', ' ', 'g')) >= 3
              |  THEN list_distinct(list_transform(
              |    generate_series(1, length(regexp_replace(lower(trim(text)),
              |                    '\\s+', ' ', 'g')) - 2),
              |    i -> CAST(concat('0x', substr(md5(
              |      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
              |        [CAST(i AS INT) : CAST(i AS INT) + 2]), 1, 12))
              |      AS BIGINT)))
              |  ELSE [] END AS sh
              |  FROM documents),
              |scored AS (
              |  SELECT c.a, c.b,
              |         len(x.sh) + len(y.sh) AS st,
              |         len(list_distinct(list_concat(x.sh, y.sh))) AS un
              |  FROM cand c JOIN sh x ON x.doc_id = c.a
              |              JOIN sh y ON y.doc_id = c.b),
              |dropped AS (
              |  SELECT DISTINCT b FROM scored
              |  WHERE round(CASE WHEN un = 0 THEN 0.0
              |        ELSE CAST(st - un AS DOUBLE) / un END, 6) >= 0.5)
              |SELECT doc_id, lang, n_chars FROM documents
              |WHERE doc_id NOT IN (SELECT b FROM dropped)
              |ORDER BY doc_id""".stripMargin)),

    // ---- the full curation funnel end-to-end: exact dedup -> near-dup
    // survivors -> quality floor -> language allowlist, one oracle ----
    Q("q45_curate_funnel",
      (s, d) => {
        import s.implicits._
        Curate.curate(T(s, d, "documents"), "text", "doc_id",
          minQuality = 0.5, langs = Seq("en"), nearDupThreshold = 0.5,
          cacheKey = Some(d))
          .select($"doc_id", $"lang", $"source")
          .orderBy($"doc_id")
      },
      Some(s"""WITH exact AS (
              |  SELECT * FROM documents WHERE doc_id IN (
              |    SELECT min(doc_id) FROM documents
              |    GROUP BY md5(regexp_replace(lower(trim(text)),
              |                 '\\s+', ' ', 'g')))),
              |${dCandidateCtes},
              |${dVerifiedPairCtes(0.5)},
              |dropped AS (
              |  SELECT DISTINCT p.b FROM p
              |  WHERE p.a IN (SELECT doc_id FROM exact)
              |    AND p.b IN (SELECT doc_id FROM exact)),
              |survivors AS (
              |  SELECT * FROM exact
              |  WHERE doc_id NOT IN (SELECT b FROM dropped)),
              |feat AS (SELECT doc_id, lang, source, text,
              |  CAST(length(text) AS DOUBLE) AS nc,
              |  CAST(len($dTokens) AS DOUBLE) AS nw,
              |  CAST(length(text) - length(regexp_replace(text,
              |       '[[:punct:]]', '', 'g')) AS DOUBLE) AS np,
              |  CAST(length(text) - length(regexp_replace(text,
              |       '[A-Z]', '', 'g')) AS DOUBLE) AS nu
              |  FROM survivors),
              |q AS (SELECT doc_id, lang, source, text FROM feat
              |  WHERE round(
              |    least(nc / 200.0, 1.0) * 0.3 +
              |    (CASE WHEN nw > 0 AND nc / nw >= 3 AND nc / nw <= 12
              |          THEN 1.0 ELSE 0.5 END) * 0.2 +
              |    (1.0 - least(np / greatest(nc, 1.0) * 4.0, 1.0)) * 0.3 +
              |    (1.0 - least(nu / greatest(nc, 1.0) * 2.0, 1.0)) * 0.2,
              |    6) >= 0.5),
              |h AS (SELECT doc_id, lang, source,
              |  ${dHits("en")} AS e, ${dHits("de")} AS g,
              |  ${dHits("fr")} AS f, ${dHits("es")} AS sp FROM q)
              |SELECT doc_id, lang, source FROM h
              |WHERE NOT (e <= 0 AND g <= 0 AND f <= 0 AND sp <= 0)
              |  AND e >= g AND e >= f AND e >= sp
              |ORDER BY doc_id""".stripMargin)),

    // ---- near-dup CONNECTED COMPONENTS: pairs say "a~b"; curation
    // needs the transitive cluster. Large-star/small-star (or driver
    // union-find below the adaptive limit) labels every doc with the
    // min doc_id of its duplicate cluster; oracle is a recursive CTE
    // reachability fixpoint over the same verified pairs ----
    Q("q57_dedup_components",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val comp = Dedup.stagedComponents(docs, "text", "doc_id",
            cacheKey = d, threshold = 0.5, ngram = 3)
          .withColumnRenamed("id", "doc_id")
        val labels = docs.select($"doc_id")
          .join(comp, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"component", $"doc_id").as("component"))
        val sizes = labels.groupBy($"component")
          .agg(count(lit(1)).as("n_members"))
        labels.join(sizes, "component")
          .select($"doc_id", $"component", $"n_members")
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $dCandidateCtes,
              |${dNearDupDropCtes("documents", 0.5)},
              |edges AS (
              |  SELECT a, b FROM scored
              |  WHERE round(CASE WHEN un = 0 THEN 0.0
              |        ELSE CAST(st - un AS DOUBLE) / un END, 6) >= 0.5),
              |und AS (SELECT a, b FROM edges
              |        UNION SELECT b AS a, a AS b FROM edges),
              |reach AS (
              |  SELECT doc_id AS src, doc_id AS node FROM documents
              |  UNION
              |  SELECT r.src, u.b AS node
              |  FROM reach r JOIN und u ON u.a = r.node),
              |comp AS (
              |  SELECT src AS doc_id, min(node) AS component
              |  FROM reach GROUP BY src),
              |sizes AS (SELECT component, count(*) AS n_members
              |          FROM comp GROUP BY component)
              |SELECT c.doc_id, c.component, s.n_members
              |FROM comp c JOIN sizes s USING (component)
              |ORDER BY c.doc_id""".stripMargin)),

    // ---- keep-BEST-per-cluster dedup: components pick the duplicate
    // clusters; the survivor is the highest-QUALITY member (tie ->
    // lowest id), not the lowest id — what production curation
    // actually ships. One window argmax over the labeled corpus ----
    Q("q70_dedup_keep_best",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        val comp = Dedup.stagedComponents(docs, "text", "doc_id",
            cacheKey = d, threshold = 0.5, ngram = 3)
          .withColumnRenamed("id", "doc_id")
        docs.select($"doc_id",
            TextFunctions.qualityScore($"text").as("q"))
          .join(comp, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"component", $"doc_id").as("component"), $"q")
          .withColumn("rn", row_number().over(Window
            .partitionBy($"component")
            .orderBy($"q".desc, $"doc_id".asc)))
          .where($"rn" === 1)
          .select($"doc_id", $"component", $"q".as("quality"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $dCandidateCtes,
              |${dNearDupDropCtes("documents", 0.5)},
              |edges AS (
              |  SELECT a, b FROM scored
              |  WHERE round(CASE WHEN un = 0 THEN 0.0
              |        ELSE CAST(st - un AS DOUBLE) / un END, 6) >= 0.5),
              |und AS (SELECT a, b FROM edges
              |        UNION SELECT b AS a, a AS b FROM edges),
              |reach AS (
              |  SELECT doc_id AS src, doc_id AS node FROM documents
              |  UNION
              |  SELECT r.src, u.b AS node
              |  FROM reach r JOIN und u ON u.a = r.node),
              |comp AS (
              |  SELECT src AS doc_id, min(node) AS component
              |  FROM reach GROUP BY src),
              |qf AS ($dQualityFeatures FROM documents),
              |qq AS (SELECT doc_id, $dQualityExpr AS q FROM qf),
              |lab AS (SELECT c.doc_id, c.component, qq.q
              |        FROM comp c JOIN qq USING (doc_id))
              |SELECT doc_id, component, q AS quality FROM (
              |  SELECT doc_id, component, q, row_number() OVER (
              |    PARTITION BY component ORDER BY q DESC, doc_id ASC)
              |    AS rn
              |  FROM lab) WHERE rn = 1
              |ORDER BY doc_id""".stripMargin)),

    // ---- deterministic hash split/sampling: md5-bucket assignment is
    // engine-portable and stable under recuration (randomSplit's
    // per-partition RNG is neither) ----
    Q("q58_split_assign",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents")
          .select($"doc_id",
            Curate.hashBucket($"doc_id").as("bucket"),
            Curate.splitAssign($"doc_id",
              Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
              .as("split"),
            (Curate.hashBucket($"doc_id", "sample") < 2000)
              .as("in_sample"))
          .orderBy($"doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
             |  CAST(concat('0x', substr(md5(concat('graft',
             |    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 10000
             |    AS bucket,
             |  CAST(concat('0x', substr(md5(concat('sample',
             |    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 10000
             |    AS sbucket
             |  FROM documents)
             |SELECT doc_id, bucket,
             |  CASE WHEN bucket < 8000 THEN 'train'
             |       WHEN bucket < 9000 THEN 'val'
             |       ELSE 'test' END AS split,
             |  sbucket < 2000 AS in_sample
             |FROM b ORDER BY doc_id""".stripMargin)),

    // ---- JSONL shard export round trip: the sink format training
    // pipelines actually consume. Split-assigned docs are written
    // partitionBy(split) as JSONL (text with newlines survives JSON
    // escaping), read back through partition discovery, and
    // aggregated per split; the oracle recomputes the same aggregates
    // from the inputs — so the write→read round trip must be lossless
    // for the row to hash-match ----
    Q("q71_jsonl_export",
      (s, d) => {
        import s.implicits._
        val out = graft.TempDirs.create("graft-q71-jsonl")
        T(s, d, "documents")
          .select($"doc_id", $"text", $"lang", $"source",
            Curate.splitAssign($"doc_id",
              Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
              .as("split"))
          .write.mode("overwrite").partitionBy("split").json(out)
        s.read.json(out)
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            sum($"doc_id").as("sum_ids"),
            sum(length($"text")).as("sum_chars"),
            countDistinct($"source").as("n_sources"))
          .orderBy($"split")
      },
      Some("""WITH b AS (SELECT doc_id, text, source,
             |  CAST(concat('0x', substr(md5(concat('graft',
             |    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 10000
             |    AS bucket
             |  FROM documents)
             |SELECT CASE WHEN bucket < 8000 THEN 'train'
             |            WHEN bucket < 9000 THEN 'val'
             |            ELSE 'test' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
             |  count(DISTINCT source) AS n_sources
             |FROM b GROUP BY 1 ORDER BY split""".stripMargin)),

    // ---- Gopher/MassiveText repetition signals: duplicate-line
    // fractions are map-side array ops; the top word-bigram is ONE
    // hash-agg + per-doc argmax window (deterministic tiebreak) ----
    Q("q59_repetition_signals",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        // staged projections: each array intermediate is computed ONCE
        // per row (interpreted HOF lambdas re-evaluate embedded
        // subtrees per element — composing the raw Column helpers here
        // measured 100x slower)
        val metrics = docs
          .withColumn("ls", TextFunctions.docLines($"text"))
          .withColumn("lsd", array_distinct($"ls"))
          .withColumn("nl", size($"ls").cast("double"))
          .withColumn("nld", size($"lsd").cast("double"))
          .withColumn("tot", aggregate($"ls", lit(0L),
            (a, l) => a + length(l)).cast("double"))
          .withColumn("dis", aggregate($"lsd", lit(0L),
            (a, l) => a + length(l)).cast("double"))
          .select($"doc_id",
            when($"nl" > 0, round(($"nl" - $"nld") / $"nl", 6))
              .otherwise(lit(0.0)).as("dup_line_frac"),
            when($"tot" > 0, round(($"tot" - $"dis") / $"tot", 6))
              .otherwise(lit(0.0)).as("dup_char_frac"),
            length(concat_ws(" ", TextFunctions.tokens($"text")))
              .cast("double").as("tchars"))
        val grams = docs
          .withColumn("t", TextFunctions.tokens($"text"))
          .select($"doc_id",
            explode(TextFunctions.bigramsFromTokens($"t")).as("g"))
          .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        val top = grams
          .withColumn("rn", row_number().over(
            Window.partitionBy($"doc_id").orderBy($"c".desc, $"g".asc)))
          .where($"rn" === 1).drop("rn")
        metrics.join(top, Seq("doc_id"), "left")
          .select($"doc_id", $"dup_line_frac", $"dup_char_frac",
            coalesce($"g", lit("")).as("top_bigram"),
            round(coalesce($"c" * length($"g") / $"tchars", lit(0.0)), 6)
              .as("top_bigram_frac"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH ls AS (SELECT doc_id,
              |  list_filter(list_transform(string_split(text, chr(10)),
              |    l -> trim(l)), l -> l != '') AS ls,
              |  $dTokens AS t FROM documents),
              |m AS (SELECT doc_id,
              |  CASE WHEN len(ls) > 0 THEN round(
              |    CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
              |      / len(ls), 6) ELSE 0.0 END AS dup_line_frac,
              |  CASE WHEN coalesce(list_sum(list_transform(ls,
              |         l -> length(l))), 0) > 0 THEN round(
              |    CAST(list_sum(list_transform(ls, l -> length(l)))
              |       - list_sum(list_transform(list_distinct(ls),
              |           l -> length(l))) AS DOUBLE)
              |      / list_sum(list_transform(ls, l -> length(l))), 6)
              |  ELSE 0.0 END AS dup_char_frac,
              |  CAST(length(array_to_string(t, ' ')) AS DOUBLE) AS tchars,
              |  t FROM ls),
              |g AS (SELECT doc_id,
              |  unnest(list_transform(generate_series(1, len(t) - 1),
              |    i -> t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]))
              |    AS g
              |  FROM m WHERE len(t) >= 2),
              |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
              |top AS (SELECT doc_id, g, c FROM (
              |  SELECT doc_id, g, c, row_number() OVER (
              |    PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
              |  FROM c) WHERE rn = 1)
              |SELECT m.doc_id, m.dup_line_frac, m.dup_char_frac,
              |  coalesce(top.g, '') AS top_bigram,
              |  round(coalesce(top.c * length(top.g) / m.tchars, 0.0), 6)
              |    AS top_bigram_frac
              |FROM m LEFT JOIN top USING (doc_id)
              |ORDER BY m.doc_id""".stripMargin)),

    // ---- int8 scalar quantization: the 4x memory lever for vector
    // search at 100 TB. Map-side only; both engines do IEEE double
    // division + half-away-from-zero rounding, so quantized codes are
    // bit-identical. cos_keep certifies the retained fidelity ----
    Q("q60_quantize_int8",
      (s, d) => {
        import s.implicits._
        Similarity.withInt8Quantization(T(s, d, "embeddings"), "embedding")
          .select($"vec_id",
            round($"scale", 9).as("scale_r"),
            aggregate($"q", lit(0L), (a, x) => a + x).as("q_sum"),
            aggregate($"q", lit(0L), (a, x) => a + abs(x)).as("q_l1"),
            round(Similarity.cosine($"v", $"deq"), 6).as("cos_keep"))
          .orderBy($"vec_id")
      },
      Some("""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |           FROM embeddings),
             |s AS (SELECT vec_id, v,
             |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |  FROM b),
             |qq AS (SELECT vec_id, v, scale,
             |  list_transform(v, x -> CASE WHEN scale > 0 THEN
             |    CAST(greatest(-127.0, least(127.0,
             |      round(x / scale, 0))) AS BIGINT)
             |    ELSE 0 END) AS q
             |  FROM s),
             |dd AS (SELECT vec_id, v, scale, q,
             |  list_transform(q, x -> CAST(x AS DOUBLE) * scale) AS deq
             |  FROM qq),
             |sc AS (SELECT vec_id, scale, q,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * deq[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(deq, x -> x * x))) AS nd
             |  FROM dd)
             |SELECT vec_id, round(scale, 9) AS scale_r,
             |  CAST(coalesce(list_sum(q), 0) AS BIGINT) AS q_sum,
             |  CAST(coalesce(list_sum(list_transform(q, x -> abs(x))), 0)
             |    AS BIGINT) AS q_l1,
             |  round(CASE WHEN nv = 0 OR nd = 0 THEN 0
             |        ELSE dt / (nv * nd) END, 6) AS cos_keep
             |FROM sc ORDER BY vec_id""".stripMargin)),

    // ---- corpus token histogram: the basic corpus-stats operator
    // (vocabulary head inspection). explode -> ONE hash-agg shuffle
    // (map-side partial aggregation collapses the token stream before
    // the exchange) -> TakeOrdered; deterministic tiebreak ----
    Q("q61_token_histogram",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents")
          .select(explode(TextFunctions.tokens($"text")).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token".asc)
          .limit(50)
      },
      Some(s"""SELECT t AS token, count(*) AS n
              |FROM (SELECT unnest($dTokens) AS t FROM documents)
              |GROUP BY t
              |ORDER BY n DESC, token ASC
              |LIMIT 50""".stripMargin)),

    // ---- per-doc most-distinctive term: TF x linear inverse document
    // frequency (N/df instead of ln(N/df): log is not correctly-rounded
    // IEEE, so ln would drift between engines' libms; ratios and
    // divisions are exact-rounded and engine-identical). Two hash-agg
    // shuffles (doc-term, term) + one window argmax ----
    Q("q62_term_relevance",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        val n = docs.count() // driver scalar, folded as a literal
        val tok = docs.select($"doc_id",
          explode(TextFunctions.tokens($"text")).as("token"))
        val tf = tok.groupBy($"doc_id", $"token")
          .agg(count(lit(1)).as("c"))
          .withColumn("nt", sum($"c").over(Window.partitionBy($"doc_id")))
        val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
        tf.join(df, "token")
          .withColumn("score",
            round(($"c".cast("double") / $"nt") *
              (lit(n).cast("double") / $"df"), 6))
          .withColumn("rn", row_number().over(Window.partitionBy($"doc_id")
            .orderBy($"score".desc, $"token".asc)))
          .where($"rn" === 1)
          .select($"doc_id", $"token".as("term"), $"score")
          .orderBy($"doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($dTokens) AS token
              |            FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS c
              |       FROM tok GROUP BY doc_id, token),
              |nt AS (SELECT doc_id, sum(c) AS nt FROM tf GROUP BY doc_id),
              |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
              |n AS (SELECT count(*) AS n FROM documents),
              |sc AS (SELECT tf.doc_id, tf.token,
              |  round((CAST(c AS DOUBLE) / nt.nt)
              |    * (CAST(n.n AS DOUBLE) / df.df), 6) AS score
              |  FROM tf JOIN nt USING (doc_id) JOIN df USING (token), n)
              |SELECT doc_id, token AS term, score FROM (
              |  SELECT doc_id, token, score, row_number() OVER (
              |    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rn
              |  FROM sc) WHERE rn = 1
              |ORDER BY doc_id""".stripMargin)),

    // ---- benchmark decontamination: flag training docs sharing too
    // many character-shingle hashes with a benchmark set (here: every
    // 50th doc stands in for the held-out benchmark). The benchmark
    // shingle union is bounded by the benchmark suite size — NOT
    // corpus-linear — so broadcasting it is the honest 100 TB plan:
    // the train side streams map-side through one broadcast semi-join
    // + one per-doc count shuffle ----
    Q("q63_decontaminate",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        Curate.contaminationScores(
            docs.where($"doc_id" % 50 =!= 0),
            docs.where($"doc_id" % 50 === 0),
            "text", "doc_id", ngram = 3)
          .select($"doc_id", $"n_sh", $"n_shared", $"contam_frac",
            ($"contam_frac" >= 0.5).as("contaminated"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, $dShingles3 AS sh
              |           FROM documents),
              |bs AS (SELECT DISTINCT unnest(sh) AS h FROM sh
              |       WHERE doc_id % 50 = 0),
              |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 != 0),
              |shared AS (
              |  SELECT t.doc_id, count(*) AS ns
              |  FROM (SELECT doc_id, unnest(sh) AS h FROM tr) t
              |  JOIN bs USING (h)
              |  GROUP BY t.doc_id)
              |SELECT tr.doc_id, len(tr.sh) AS n_sh,
              |  coalesce(s.ns, 0) AS n_shared,
              |  CASE WHEN len(tr.sh) > 0 THEN round(
              |    CAST(coalesce(s.ns, 0) AS DOUBLE) / len(tr.sh), 6)
              |  ELSE 0.0 END AS contam_frac,
              |  (CASE WHEN len(tr.sh) > 0 THEN round(
              |    CAST(coalesce(s.ns, 0) AS DOUBLE) / len(tr.sh), 6)
              |  ELSE 0.0 END) >= 0.5 AS contaminated
              |FROM tr LEFT JOIN shared s USING (doc_id)
              |ORDER BY tr.doc_id""".stripMargin)),

    // ---- corpus length deciles: the distribution snapshot every
    // curation run reports. Exact `percentile` here for oracle parity
    // (both engines implement the standard (n-1)*p linear
    // interpolation); at 100 TB the same query swaps in
    // approx_percentile, whose t-digest sketch merges map-side ----
    Q("q64_length_quantiles",
      (s, d) => {
        import s.implicits._
        val ps = (1 to 9).map(_ / 10.0)
        T(s, d, "documents")
          .agg(percentile($"n_chars",
            typedlit(ps)).as("qs"))
          .select(posexplode($"qs"))
          .select(($"pos" + 1).cast("long").as("decile"),
            round($"col", 6).as("n_chars_q"))
          .orderBy($"decile")
      },
      Some("""WITH q AS (SELECT quantile_cont(n_chars,
             |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
             |  FROM documents)
             |SELECT CAST(generate_subscripts(qs, 1) AS BIGINT) AS decile,
             |  round(unnest(qs), 6) AS n_chars_q
             |FROM q ORDER BY decile""".stripMargin)),

    // ---- unigram familiarity: mean corpus-probability of a doc's
    // tokens (rare-token docs are OCR noise / gibberish — the cheap
    // perplexity stand-in). mean_p = (sum of per-token corpus counts)
    // / (T * n): the numerator is an EXACT integer sum, so the score
    // is partitioning-independent — no float-accumulation drift, and
    // no ln (not correctly-rounded IEEE, drifts across libms) ----
    Q("q65_unigram_familiarity",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val tok = docs.select($"doc_id",
          explode(TextFunctions.tokens($"text")).as("token"))
        val tc = tok.groupBy($"token").agg(count(lit(1)).as("c"))
        val t = tok.count() // corpus token total, folded as a literal
        val ds = tok.join(tc, "token").groupBy($"doc_id")
          .agg(count(lit(1)).as("n_toks"), sum($"c").as("sum_freq"))
        docs.select($"doc_id").join(ds, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"n_toks", lit(0L)).as("n_toks"),
            coalesce($"sum_freq", lit(0L)).as("sum_freq"),
            when(coalesce($"n_toks", lit(0L)) > 0,
              round($"sum_freq".cast("double") /
                (lit(t) * $"n_toks").cast("double"), 6))
              .otherwise(lit(0.0)).as("familiarity"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($dTokens) AS token
              |            FROM documents),
              |tc AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
              |tot AS (SELECT count(*) AS t FROM tok),
              |ds AS (SELECT tok.doc_id, count(*) AS n,
              |         CAST(sum(tc.c) AS BIGINT) AS sc
              |       FROM tok JOIN tc USING (token) GROUP BY tok.doc_id)
              |SELECT d.doc_id,
              |  coalesce(ds.n, 0) AS n_toks,
              |  coalesce(ds.sc, 0) AS sum_freq,
              |  CASE WHEN coalesce(ds.n, 0) > 0 THEN round(
              |    CAST(ds.sc AS DOUBLE) / CAST(t * ds.n AS DOUBLE), 6)
              |  ELSE 0.0 END AS familiarity
              |FROM documents d LEFT JOIN ds ON d.doc_id = ds.doc_id, tot
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- per-source curation report: the dashboard aggregation a
    // pipeline emits per run (docs, distinct contents, mean quality,
    // language spread per source). ONE hash-agg shuffle; the mean
    // routes through an exact DECIMAL sum (float sums are
    // partition-order-dependent — the q29 rule) ----
    Q("q66_source_report",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents").select($"source",
            TextFunctions.fingerprint($"text").as("fp"),
            TextFunctions.qualityScore($"text").cast("decimal(10,6)")
              .as("q"),
            TextFunctions.langId($"text").as("lang_pred"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"fp").as("n_unique"),
            round(sum($"q").cast("double") / count(lit(1)), 6)
              .as("avg_quality"),
            countDistinct($"lang_pred").as("n_langs"))
          .orderBy($"source")
      },
      Some(s"""WITH qf AS ($dQualityFeatures, source, text
              |           FROM documents),
              |per AS (SELECT doc_id, source,
              |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
              |    AS fp,
              |  $dQualityExpr AS q,
              |  ${dHits("en")} AS he, ${dHits("de")} AS hg,
              |  ${dHits("fr")} AS hf, ${dHits("es")} AS hs
              |  FROM qf)
              |SELECT source, count(*) AS n_docs,
              |  count(DISTINCT fp) AS n_unique,
              |  round(CAST(sum(CAST(q AS DECIMAL(10,6))) AS DOUBLE)
              |    / count(*), 6) AS avg_quality,
              |  count(DISTINCT CASE
              |    WHEN he <= 0 AND hg <= 0 AND hf <= 0 AND hs <= 0
              |      THEN 'und'
              |    WHEN he >= hg AND he >= hf AND he >= hs THEN 'en'
              |    WHEN hg >= hf AND hg >= hs THEN 'de'
              |    WHEN hf >= hs THEN 'fr'
              |    ELSE 'es' END) AS n_langs
              |FROM per GROUP BY source ORDER BY source""".stripMargin)),

    // ---- per-label embedding centroids (vector aggregation) ----
    Q("q29_centroids",
      (s, d) => {
        import s.implicits._
        Similarity.centroids(T(s, d, "embeddings"), "embedding", "label")
          .select($"label", concat_ws(",",
            transform($"centroid", m => format_string("%.6f", m)))
            .as("centroid_s"))
          .orderBy($"label")
      },
      Some("""WITH e AS (SELECT label, unnest(embedding) AS x,
             |    generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |m AS (SELECT label, pos,
             |    CAST(sum(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
             |      / count(*) AS m
             |  FROM e GROUP BY label, pos)
             |SELECT label,
             |  string_agg(printf('%.6f', round(m, 6)), ',' ORDER BY pos)
             |    AS centroid_s
             |FROM m GROUP BY label ORDER BY label""".stripMargin)),

    // ---- multimodal binary plumbing: bytes, hash, frame offsets ----
    Q("q30_multimodal_bytes",
      (s, d) => {
        import s.implicits._
        Multimodal.assetsFromDocuments(T(s, d, "documents"))
          .select($"asset_id", $"kind",
            octet_length($"bytes").cast("long").as("n_bytes"),
            md5(hex($"bytes")).as("content_hash"))
          .orderBy($"asset_id")
      },
      Some("""SELECT doc_id AS asset_id,
             |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
             |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  octet_length(CAST(text AS BLOB)) AS n_bytes,
             |  md5(hex(CAST(text AS BLOB))) AS content_hash
             |FROM documents ORDER BY asset_id""".stripMargin)),

    // ---- sequence packing: lay the token stream (ws tokens + 1 EOS
    // per doc) end-to-end in doc_id order and slice it into 512-token
    // training windows; docs crossing a boundary split across both.
    // The global prefix sum is the scalable two-phase scan of
    // [[Curate.tokenStarts]] (per-partition sums -> driver prefix ->
    // within-partition windows), NOT a single global window (which
    // Spark would execute on one partition). Output = the per-sequence
    // packing manifest ----
    Q("q72_sequence_packing",
      (s, d) => {
        import s.implicits._
        Curate.packSequences(T(s, d, "documents"), "doc_id",
            TextFunctions.tokenCountWs($"text") + 1, 512)
          .groupBy($"seq_id")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("n_tokens"),
            min($"doc_id").as("first_doc"),
            max($"doc_id").as("last_doc"))
          .orderBy($"seq_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, CAST(len($dTokens) + 1 AS BIGINT) AS tok
              |  FROM documents),
              |st AS (SELECT doc_id, tok,
              |  CAST(coalesce(sum(tok) OVER (ORDER BY doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    0) AS BIGINT) AS strt
              |  FROM t),
              |x AS (SELECT doc_id, strt, strt + tok AS fin,
              |  unnest(generate_series(strt // 512,
              |                         (strt + tok - 1) // 512))
              |    AS seq_id
              |  FROM st)
              |SELECT CAST(seq_id AS BIGINT) AS seq_id,
              |  count(*) AS n_docs,
              |  CAST(sum(least(fin, (seq_id + 1) * 512)
              |      - greatest(strt, seq_id * 512)) AS BIGINT)
              |    AS n_tokens,
              |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
              |FROM x GROUP BY seq_id ORDER BY seq_id""".stripMargin),
      bench = true),

    // ---- weighted corpus mixing: per-source epoch weights (drop /
    // downsample / upsample >1x) decided per doc by the deterministic
    // md5 permyriad bucket — exactly reproducible under any
    // partitioning, zero shuffle (the aggregation here is just the
    // audit). src0 dropped, src1 kept at 35%, src2 seen ~2.5 epochs,
    // src3 ~1.6, everything else 1.0 ----
    Q("q73_corpus_mix",
      (s, d) => {
        import s.implicits._
        Curate.mixCorpus(T(s, d, "documents"), "doc_id", "source",
            Map("src0" -> 0.0, "src1" -> 0.35, "src2" -> 2.5,
                "src3" -> 1.6))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct($"doc_id").as("n_docs"),
            max($"epoch").as("max_epoch"),
            sum($"doc_id" * $"epoch").as("checksum"))
          .orderBy($"source")
      },
      Some("""WITH w AS (SELECT doc_id, source,
             |  CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.35
             |       WHEN 'src2' THEN 2.5 WHEN 'src3' THEN 1.6
             |       ELSE 1.0 END AS wt,
             |  CAST(concat('0x', substr(md5(concat('mix',
             |    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 10000
             |    AS b
             |  FROM documents),
             |c AS (SELECT doc_id, source,
             |  CAST(floor(wt) AS BIGINT)
             |  + CASE WHEN b < CAST(round((wt - floor(wt)) * 10000)
             |                  AS BIGINT)
             |         THEN 1 ELSE 0 END AS copies
             |  FROM w),
             |e AS (SELECT doc_id, source,
             |  CAST(unnest(generate_series(1, CAST(copies AS INT)))
             |       AS BIGINT) AS epoch
             |  FROM c WHERE copies > 0)
             |SELECT source, count(*) AS n_rows,
             |  count(DISTINCT doc_id) AS n_docs,
             |  max(epoch) AS max_epoch,
             |  CAST(sum(doc_id * epoch) AS BIGINT) AS checksum
             |FROM e GROUP BY source ORDER BY source""".stripMargin)),

    // ---- PII scrubbing: mask emails / URLs / phone numbers with
    // typed placeholders and count each class. The corpus text has no
    // planted PII, so the query CONSTRUCTS a contact header around
    // each doc (id-derived mailbox, URL, phone) — the masking then has
    // >= 3 guaranteed hits per row and the full masked text is
    // hash-compared. Pure regexp_replace stack, map-side only ----
    Q("q74_pii_scrub",
      (s, d) => {
        import s.implicits._
        val raw = concat(
          lit("From user"), $"doc_id", lit("@example.com ("),
          lit("https://"), $"source", lit(".example.org/d/"), $"doc_id",
          lit(", tel +1 555 0"), lpad(($"doc_id" % 1000).cast("string"),
            3, "0"),
          lit(") :: "), $"text")
        T(s, d, "documents")
          .select($"doc_id", raw.as("raw"))
          .select($"doc_id",
            TextFunctions.piiMask($"raw").as("masked"),
            TextFunctions.piiCount($"raw", TextFunctions.EmailPattern)
              .cast("long").as("n_email"),
            TextFunctions.piiCount($"raw", TextFunctions.UrlPattern)
              .cast("long").as("n_url"),
            TextFunctions.piiCount($"raw", TextFunctions.PhonePattern)
              .cast("long").as("n_phone"))
          .orderBy($"doc_id")
      },
      Some("""WITH r AS (SELECT doc_id,
             |  concat('From user', CAST(doc_id AS VARCHAR),
             |    '@example.com (https://', source, '.example.org/d/',
             |    CAST(doc_id AS VARCHAR), ', tel +1 555 0',
             |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
             |    ') :: ', text) AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(raw,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |    '<EMAIL>', 'g'),
             |    'https?://[^\s]+', '<URL>', 'g'),
             |    '\+\d(?:[ -]?\d){6,13}', '<PHONE>', 'g') AS masked,
             |  len(regexp_extract_all(raw,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |    AS n_email,
             |  len(regexp_extract_all(raw, 'https?://[^\s]+')) AS n_url,
             |  len(regexp_extract_all(raw, '\+\d(?:[ -]?\d){6,13}'))
             |    AS n_phone
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- overlapping chunking (the RAG/window-attention shape):
    // 64-token windows every 48 tokens (16-token overlap), last chunk
    // ragged, full token coverage guaranteed ((nchunks-1)*stride +
    // window >= n by the ceil). One explode over a staged token
    // array — no shuffle until the final sort ----
    Q("q75_chunk_overlap",
      (s, d) => {
        import s.implicits._
        val (win, stride) = (64, 48)
        T(s, d, "documents")
          .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
          .withColumn("n", size($"toks"))
          .where($"n" > 0)
          .withColumn("nchunks",
            when($"n" <= win, lit(1L)).otherwise(
              floor(($"n" - win + stride - 1) / lit(stride))
                .cast("long") + 1L))
          .withColumn("chunk_id",
            explode(sequence(lit(0L), $"nchunks" - 1)))
          .select($"doc_id", $"chunk_id",
            slice($"toks", ($"chunk_id" * stride + 1).cast("int"),
              lit(win)).as("ctoks"))
          .select($"doc_id", $"chunk_id",
            size($"ctoks").cast("long").as("n_tok"),
            concat_ws(" ", $"ctoks").as("chunk"))
          .orderBy($"doc_id", $"chunk_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $dTokens AS t FROM documents),
              |n AS (SELECT doc_id, t, len(t) AS n FROM tk
              |      WHERE len(t) > 0),
              |c AS (SELECT doc_id, t, n,
              |  CASE WHEN n <= 64 THEN 1
              |       ELSE (n - 64 + 47) // 48 + 1 END AS nchunks
              |  FROM n),
              |e AS (SELECT doc_id, t, n,
              |  CAST(unnest(generate_series(0, nchunks - 1)) AS BIGINT)
              |    AS chunk_id
              |  FROM c)
              |SELECT doc_id, chunk_id,
              |  CAST(len(t[CAST(chunk_id * 48 + 1 AS INT)
              |             : CAST(least(chunk_id * 48 + 64, n) AS INT)])
              |       AS BIGINT) AS n_tok,
              |  array_to_string(
              |    t[CAST(chunk_id * 48 + 1 AS INT)
              |      : CAST(least(chunk_id * 48 + 64, n) AS INT)], ' ')
              |    AS chunk
              |FROM e ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- vocabulary build + OOV audit: global token counts, top-500
    // vocabulary by (count desc, token asc) — the top-V is a
    // distributed TakeOrdered, NOT a global-window rank over the whole
    // token table, and the id-assigning row_number runs on the
    // 500-row result (bounded by V, not the corpus). The vocab is
    // explicitly broadcast into the per-doc OOV join ----
    Q("q76_vocab_oov",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val toks = T(s, d, "documents")
          .select($"doc_id",
            explode(TextFunctions.tokens($"text")).as("tok"))
        val vocab = toks.groupBy($"tok")
          .agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"tok".asc).limit(500)
          .withColumn("tid", row_number()
            .over(Window.orderBy($"cnt".desc, $"tok".asc)).cast("long"))
        toks.join(broadcast(vocab.select($"tok", $"tid")),
            Seq("tok"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(when($"tid".isNull, 1L).otherwise(0L)).as("n_oov"))
          .select($"doc_id", $"n_tok", $"n_oov",
            round($"n_oov" / $"n_tok", 6).as("oov_rate"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($dTokens) AS tok
              |  FROM documents),
              |cnt AS (SELECT tok, count(*) AS cnt FROM tok
              |        GROUP BY tok),
              |vocab AS (SELECT tok FROM cnt
              |          ORDER BY cnt DESC, tok LIMIT 500),
              |j AS (SELECT t.doc_id,
              |  CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
              |  FROM tok t LEFT JOIN vocab v ON v.tok = t.tok)
              |SELECT doc_id, count(*) AS n_tok,
              |  CAST(sum(oov) AS BIGINT) AS n_oov,
              |  round(CAST(sum(oov) AS DOUBLE) / count(*), 6)
              |    AS oov_rate
              |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- cross-source similarity matrix: exact pairwise shingle
    // Jaccard between sources. Distinct (source, shingle) first, so
    // the self-join key space is bounded by #sources per shingle —
    // the blow-up per join key is <= sources^2 regardless of corpus
    // size; per-source set sizes broadcast into the final ratio ----
    Q("q77_source_similarity",
      (s, d) => {
        import s.implicits._
        val sh = T(s, d, "documents")
          .select($"source",
            explode(TextFunctions.ngramShingleHashes($"text", 3))
              .as("h"))
          .distinct()
        val sizes = sh.groupBy($"source").agg(count(lit(1)).as("sz"))
        sh.as("x").join(sh.as("y"),
            col("x.h") === col("y.h") &&
              col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("source_a"),
            col("y.source").as("source_b"))
          .agg(count(lit(1)).as("inter"))
          .join(broadcast(sizes.as("sa")),
            col("source_a") === col("sa.source"))
          .join(broadcast(sizes.as("sb")),
            col("source_b") === col("sb.source"))
          .select($"source_a", $"source_b", $"inter",
            round($"inter" /
              (col("sa.sz") + col("sb.sz") - $"inter"), 6)
              .as("jaccard"))
          .orderBy($"source_a", $"source_b")
      },
      Some(s"""WITH sh AS (SELECT DISTINCT source,
              |    unnest($dShingles3) AS h
              |  FROM documents),
              |sz AS (SELECT source, count(*) AS sz FROM sh
              |       GROUP BY source),
              |p AS (SELECT x.source AS source_a, y.source AS source_b,
              |    count(*) AS inter
              |  FROM sh x JOIN sh y
              |    ON x.h = y.h AND x.source < y.source
              |  GROUP BY 1, 2)
              |SELECT source_a, source_b,
              |  CAST(inter AS BIGINT) AS inter,
              |  round(CAST(inter AS DOUBLE)
              |        / (sa.sz + sb.sz - inter), 6) AS jaccard
              |FROM p JOIN sz sa ON sa.source = source_a
              |       JOIN sz sb ON sb.source = source_b
              |ORDER BY source_a, source_b""".stripMargin)),

    // ---- per-source quality quota: keep each source's top-5 docs by
    // quality (stratified curation — a global top-N would let one
    // high-quality source crowd out the rest). Window ranks WITHIN a
    // source partition, so the shuffle key is the source and the sort
    // is per-group; quality is the 6-dp-rounded score (tie-broken by
    // doc_id) so the rank is engine-exact ----
    Q("q79_quality_quota",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        T(s, d, "documents")
          .select($"doc_id", $"source",
            TextFunctions.qualityScore($"text").as("quality"))
          .withColumn("rank", row_number().over(Window
            .partitionBy($"source")
            .orderBy($"quality".desc, $"doc_id".asc)).cast("long"))
          .where($"rank" <= 5)
          .select($"source", $"rank", $"doc_id", $"quality")
          .orderBy($"source", $"rank")
      },
      Some(s"""WITH f AS ($dQualityFeatures, source FROM documents),
              |q AS (SELECT doc_id, source, $dQualityExpr AS quality
              |      FROM f)
              |SELECT source, rank, doc_id, quality FROM (
              |  SELECT source, doc_id, quality,
              |    CAST(row_number() OVER (PARTITION BY source
              |      ORDER BY quality DESC, doc_id ASC) AS BIGINT)
              |      AS rank
              |  FROM q)
              |WHERE rank <= 5 ORDER BY source, rank""".stripMargin)),

    // ---- exact duplicated-substring spans (the suffix-array "dedup
    // repeated substrings" pass, re-expressed distributed): hash every
    // 40-char window, ONE shuffle groups window hashes corpus-wide,
    // windows seen >1x flag their positions, and a per-doc window merge
    // turns flagged positions into maximal cut spans ----
    Q("q80_dup_spans",
      (s, d) => Dedup.duplicatedSpans(T(s, d, "documents"), "text",
        "doc_id", k = 40)
        .orderBy(col("doc_id"), col("span_start")), // A7 presentation
      Some("""WITH p0 AS (
             |  SELECT doc_id, text,
             |    unnest(generate_series(1, len(text) - 39)) AS pos
             |  FROM documents WHERE len(text) >= 40),
             |p AS (
             |  SELECT doc_id, pos,
             |    CAST(concat('0x', substr(
             |      md5(substr(text, CAST(pos AS INT), 40)), 1, 12))
             |      AS BIGINT) AS hh
             |  FROM p0),
             |dup AS (SELECT hh FROM p GROUP BY hh HAVING count(*) > 1),
             |f AS (SELECT doc_id, pos FROM p
             |      WHERE hh IN (SELECT hh FROM dup)),
             |b AS (SELECT doc_id, pos,
             |  CASE WHEN pos > coalesce(max(pos) OVER (
             |         PARTITION BY doc_id ORDER BY pos
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |       -9223372036854775807) + 40 THEN 1 ELSE 0 END AS brk
             |  FROM f),
             |g AS (SELECT doc_id, pos,
             |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos)
             |          AS island
             |      FROM b)
             |SELECT doc_id, min(pos) AS span_start,
             |  max(pos) + 39 AS span_end, count(*) AS n_shingles
             |FROM g GROUP BY doc_id, island
             |ORDER BY doc_id, span_start""".stripMargin)),

    // ---- BM25 document ranking for a fixed term query (the retrieval
    // scorer of data-curation search). Linear IDF (N-df+.5)/(df+.5)
    // instead of its usual log: log is not correctly-rounded IEEE so it
    // drifts between libms, while +,-,*,/ are exact-rounded and
    // engine-identical (same rationale as q62). Per-term contributions
    // are rounded to 6dp and summed through DECIMAL so the fold order
    // can't change the float. Plan: tf is one hash-agg over the
    // term-filtered token stream (the IN filter prunes map-side), df is
    // |query| rows and broadcast, dl joins co-partitioned on doc_id ----
    Q("q82_bm25",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val terms = Seq("spark", "join", "filter")
        // dl is used three times (corpus stats, then the score join)
        // and SHARED with q159's BM25 leg — the staged parquet
        // artifact runs the tokenize pass once per corpus per JVM and
        // every consumer reads it back (an in-memory persist() here
        // re-tokenized per query and pinned cache blocks for the JVM
        // lifetime — the r12 advisor finding)
        val dl = TextFunctions.stagedDocLengths(docs, "text", "doc_id",
          cacheKey = d)
        val r = dl.agg(count(lit(1)), sum($"dl")).first()
        val nDocs = r.getLong(0)
        val avgdl = r.getLong(1).toDouble / nDocs.toDouble
        val tf = docs.select($"doc_id",
            explode(TextFunctions.tokens($"text")).as("token"))
          .where($"token".isin(terms: _*))
          .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
        val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
        val idf = (lit(nDocs.toDouble) - $"df" + lit(0.5)) /
          ($"df" + lit(0.5))
        val num = $"c".cast("double") * lit(2.2)
        val den = $"c".cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * ($"dl".cast("double") / lit(avgdl)))
        tf.join(broadcast(df), "token")
          .join(dl, "doc_id")
          .select($"doc_id",
            round(idf * (num / den), 6).cast("decimal(18,6)")
              .as("contrib"))
          .groupBy($"doc_id")
          .agg(sum($"contrib").cast("double").as("score"))
          .orderBy($"score".desc, $"doc_id".asc)
          .limit(20)
      },
      Some(s"""WITH dl AS (SELECT doc_id,
              |  CAST(len($dTokens) AS BIGINT) AS dl FROM documents),
              |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              |    AS avgdl FROM dl),
              |tok AS (SELECT doc_id, unnest($dTokens) AS token
              |        FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS c FROM tok
              |       WHERE token IN ('spark', 'join', 'filter')
              |       GROUP BY doc_id, token),
              |df AS (SELECT token, count(*) AS df FROM tf
              |       GROUP BY token),
              |sc AS (SELECT tf.doc_id,
              |  CAST(round(((st.n - df.df + 0.5) / (df.df + 0.5))
              |    * ((CAST(c AS DOUBLE) * 2.2)
              |       / (CAST(c AS DOUBLE) + 1.2 * (0.25 + 0.75
              |          * (CAST(dl.dl AS DOUBLE) / st.avgdl)))), 6)
              |    AS DECIMAL(18,6)) AS contrib
              |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), st)
              |SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS score
              |FROM sc GROUP BY doc_id
              |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- cross-asset frame dedup (the video/audio near-dup primitive):
    // sample 8 deterministic 16-byte frames per asset map-side
    // ([[Multimodal.frameSample]] — pure BINARY substring, no UDF), hash
    // each frame, ONE shuffle groups frame hashes corpus-wide, and
    // frames shared by >1 asset come back as dedup candidates. The
    // oracle mirrors the byte slicing with char substr (asset bytes are
    // the docs' ASCII text, so char == byte) ----
    Q("q85_frame_dedup",
      (s, d) => {
        import s.implicits._
        Multimodal.assetsFromDocuments(T(s, d, "documents"))
          .select($"asset_id",
            explode(Multimodal.frameSample($"bytes", 8, 16)).as("frame"))
          .select($"asset_id", md5($"frame").as("fh"))
          .groupBy($"fh")
          .agg(countDistinct($"asset_id").as("n_assets"),
            count(lit(1)).as("n_occ"),
            min($"asset_id").as("first_asset"))
          .where($"n_assets" > 1)
          .orderBy($"fh")
      },
      Some("""WITH a AS (SELECT doc_id AS asset_id, text,
             |            len(text) AS L FROM documents),
             |f AS (SELECT asset_id,
             |        substr(text, CAST(floor(i * L / 8) AS INT) + 1, 16)
             |          AS fr
             |      FROM a, generate_series(0, 7) AS t(i))
             |SELECT md5(fr) AS fh,
             |  count(DISTINCT asset_id) AS n_assets,
             |  count(*) AS n_occ, min(asset_id) AS first_asset
             |FROM f GROUP BY fh
             |HAVING count(DISTINCT asset_id) > 1
             |ORDER BY fh""".stripMargin)),

    // ---- kNN graph construction (the SemDeDup/diversity-analysis
    // primitive): top-3 cosine neighbors for a BOUNDED probe batch
    // (1-in-25 of the first 5000 ids — constant-size at any SF, like a
    // training mini-batch; an UNBOUNDED 1-in-25 rate makes the scan
    // O(0.04*N^2), measured 26x per decade before the bound). The
    // probe side broadcasts so scoring is map-side over one corpus
    // scan; the hint stays size-gated (AQE can still pick broadcast
    // from real runtime sizes; the honest 100 TB plan for a
    // corpus-LINEAR query set is IVF/LSH bucketing, q49).
    // Scoring runs the native cosine_sim kernel: the interpreted HOF
    // chain measured ~8x slower on this pairwise workload ----
    Q("q92_knn_graph",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        Similarity.stagedKnnEdges(emb, 3, d)
          .select($"src", $"rank", $"dst", $"score")
          .orderBy($"src", $"rank")
      },
      Some("""WITH e AS (SELECT vec_id,
             |            CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |q AS (SELECT vec_id AS src, v AS qv FROM e
             |      WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |sc AS (SELECT q.src, e.vec_id AS dst,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM e, q WHERE e.vec_id != q.src),
             |scored AS (SELECT src, dst,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |  FROM sc)
             |SELECT src, rank, dst, score FROM (
             |  SELECT src, dst, score,
             |    CAST(row_number() OVER (PARTITION BY src
             |      ORDER BY score DESC, dst ASC) AS BIGINT) AS rank
             |  FROM scored)
             |WHERE rank <= 3 ORDER BY src, rank""".stripMargin)),

    // ---- pairwise edit distance (the fuzzy-match verifier for titles
    // / short fields): Levenshtein over a deterministic 1-in-10 sample
    // of adjacent doc pairs. Both engines implement the standard DP;
    // the join is a self-join on doc_id+1 (co-keyed). O(len^2) per
    // pair — sample-gated, as a production fuzzy-dedup would be
    // (candidate pairs first, DP verify second) ----
    Q("q99_edit_distance",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val a = docs.where($"doc_id" % 10 === 0)
          .select($"doc_id", $"text".as("ta"))
        val b = docs.select(($"doc_id" - 1).as("doc_id"),
          $"text".as("tb"))
        a.join(b, "doc_id")
          .select($"doc_id",
            levenshtein($"ta", $"tb").cast("long").as("lev"),
            length($"ta").cast("long").as("len_a"),
            length($"tb").cast("long").as("len_b"))
          .orderBy($"doc_id")
      },
      Some("""SELECT a.doc_id,
             |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
             |  CAST(len(a.text) AS BIGINT) AS len_a,
             |  CAST(len(b.text) AS BIGINT) AS len_b
             |FROM documents a JOIN documents b
             |  ON b.doc_id = a.doc_id + 1
             |WHERE a.doc_id % 10 = 0
             |ORDER BY a.doc_id""".stripMargin)),

    // ---- the capstone: a full training-data build. curate (exact
    // dedup -> near-dup survivors -> quality floor -> language) ->
    // decontaminate vs the benchmark slice (its docs excluded, shared-
    // shingle frac >= 0.5 dropped) -> deterministic 80/10/10 split ->
    // sequence-pack each split into 512-token windows. The output is
    // the per-split build manifest; the oracle cross-checks the REAL
    // packer against the closed form (n_seqs == ceil(n_tokens/512) —
    // if packSequences loses or double-counts a token stream, the
    // counts diverge). Every stage is a previously-verified operator;
    // this query proves they compose ----
    Q("q100_training_build",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val docs = T(s, d, "documents")
        // Staged build with materialized artifacts — the production
        // shape. Each stage's pipeline executes exactly once; keeping
        // it one lazy DAG re-executes the curate pipeline per consumer
        // branch and per packSequences action (measured 12s+ at sf0.1;
        // staged: ~5s). Stage 1: curate -> parquet.
        val buildDir = graft.TempDirs.create("graft-q100-corpus")
        Curate.curate(docs, "text", "doc_id",
            minQuality = 0.5, langs = Seq("en"), nearDupThreshold = 0.5,
            cacheKey = Some(d))
          .select($"doc_id", $"text")
          .write.mode("overwrite").parquet(s"$buildDir/curated")
        val curated = s.read.parquet(s"$buildDir/curated")
        // Stage 2: decontaminate + split -> parquet. 13-char shingles:
        // this corpus is token soup from a tiny vocabulary, so short
        // shingles saturate as the benchmark set grows (median
        // shared-frac at 3/8/13 chars: 0.95/0.44/0.07 at sf0.01,
        // 0.99/0.92/0.31 at sf0.1) — 13 separates real overlap from
        // noise at every tested scale. Shingles are computed on the
        // benchmark slice and the (already small) curated set only,
        // never the full corpus.
        Curate.decontaminate(
            curated.where($"doc_id" % 50 =!= 0),
            docs.where($"doc_id" % 50 === 0),
            "text", "doc_id", ngram = 13, threshold = 0.5)
          .select($"doc_id", $"text")
          .withColumn("split",
            Curate.splitAssign($"doc_id",
              Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)))
          .write.mode("overwrite").partitionBy("split")
          .parquet(s"$buildDir/final")
        // Stage 3: pack each split from the materialized corpus.
        // Explicit schema: a fully-filtered (empty) build writes no
        // parquet files, and schema inference would fail on read-back.
        val withSplit = s.read
          .schema("doc_id BIGINT, text STRING, split STRING")
          .parquet(s"$buildDir/final")
        val parts = Seq("train", "val", "test").map { sp =>
          Curate.packSequences(withSplit.where($"split" === sp),
              "doc_id", TextFunctions.tokenCountWs($"text") + 1, 512)
            .agg(
              coalesce(countDistinct($"doc_id"), lit(0L)).as("n_docs"),
              coalesce(sum($"n_tokens"), lit(0L)).as("n_tokens"),
              coalesce(countDistinct($"seq_id"), lit(0L)).as("n_seqs"))
            .select(lit(sp).as("split"), $"n_docs", $"n_tokens",
              $"n_seqs")
        }
        parts.reduce(_ unionAll _).orderBy($"split")
      },
      Some(s"""WITH exact AS (
              |  SELECT * FROM documents WHERE doc_id IN (
              |    SELECT min(doc_id) FROM documents
              |    GROUP BY md5(regexp_replace(lower(trim(text)),
              |                 '\\s+', ' ', 'g')))),
              |${dCandidateCtes},
              |${dVerifiedPairCtes(0.5)},
              |dropped AS (
              |  SELECT DISTINCT p.b FROM p
              |  WHERE p.a IN (SELECT doc_id FROM exact)
              |    AND p.b IN (SELECT doc_id FROM exact)),
              |survivors AS (
              |  SELECT * FROM exact
              |  WHERE doc_id NOT IN (SELECT b FROM dropped)),
              |feat AS (SELECT doc_id, lang, source, text,
              |  CAST(length(text) AS DOUBLE) AS nc,
              |  CAST(len($dTokens) AS DOUBLE) AS nw,
              |  CAST(length(text) - length(regexp_replace(text,
              |       '[[:punct:]]', '', 'g')) AS DOUBLE) AS np,
              |  CAST(length(text) - length(regexp_replace(text,
              |       '[A-Z]', '', 'g')) AS DOUBLE) AS nu
              |  FROM survivors),
              |q AS (SELECT doc_id, lang, source, text FROM feat
              |  WHERE round(
              |    least(nc / 200.0, 1.0) * 0.3 +
              |    (CASE WHEN nw > 0 AND nc / nw >= 3 AND nc / nw <= 12
              |          THEN 1.0 ELSE 0.5 END) * 0.2 +
              |    (1.0 - least(np / greatest(nc, 1.0) * 4.0, 1.0)) * 0.3 +
              |    (1.0 - least(nu / greatest(nc, 1.0) * 2.0, 1.0)) * 0.2,
              |    6) >= 0.5),
              |h AS (SELECT doc_id, lang, source,
              |  ${dHits("en")} AS e, ${dHits("de")} AS g,
              |  ${dHits("fr")} AS f, ${dHits("es")} AS sp FROM q),
              |cur AS (SELECT d.doc_id, d.text FROM documents d
              |  JOIN (SELECT doc_id FROM h
              |        WHERE NOT (e <= 0 AND g <= 0 AND f <= 0
              |                   AND sp <= 0)
              |          AND e >= g AND e >= f AND e >= sp) hh
              |    USING (doc_id)),
              |shall AS (SELECT doc_id, ${dShinglesN(13)} AS sh
              |          FROM documents),
              |bs AS (SELECT DISTINCT unnest(sh) AS hh2 FROM shall
              |       WHERE doc_id % 50 = 0),
              |cursh AS (SELECT c.doc_id, s.sh FROM cur c
              |          JOIN shall s USING (doc_id)
              |          WHERE c.doc_id % 50 != 0),
              |shared AS (SELECT t.doc_id, count(*) AS ns
              |  FROM (SELECT doc_id, unnest(sh) AS hh2 FROM cursh) t
              |  JOIN bs USING (hh2) GROUP BY t.doc_id),
              |clean AS (SELECT c.doc_id FROM cursh c
              |  LEFT JOIN shared s USING (doc_id)
              |  WHERE (CASE WHEN len(c.sh) > 0
              |         THEN round(CAST(coalesce(s.ns, 0) AS DOUBLE)
              |                    / len(c.sh), 6)
              |         ELSE 0.0 END) < 0.5),
              |sp2 AS (SELECT k.doc_id,
              |  CASE WHEN b < 8000 THEN 'train'
              |       WHEN b < 9000 THEN 'val'
              |       ELSE 'test' END AS split
              |  FROM (SELECT doc_id,
              |    CAST(concat('0x', substr(md5(concat('graft',
              |      CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
              |      % 10000 AS b
              |    FROM clean) k),
              |tok AS (SELECT s2.split,
              |  CAST(len($dTokens) + 1 AS BIGINT) AS t
              |  FROM sp2 s2 JOIN documents USING (doc_id)),
              |splits AS (SELECT unnest(['train', 'val', 'test'])
              |             AS split)
              |SELECT sl.split,
              |  CAST(coalesce(count(t.t), 0) AS BIGINT) AS n_docs,
              |  CAST(coalesce(sum(t.t), 0) AS BIGINT) AS n_tokens,
              |  CAST(ceil(CAST(coalesce(sum(t.t), 0) AS DOUBLE) / 512)
              |       AS BIGINT) AS n_seqs
              |FROM splits sl LEFT JOIN tok t ON t.split = sl.split
              |GROUP BY sl.split ORDER BY sl.split""".stripMargin)),

    // ---- q104: STREAMING exact dedup, oracle-gated — the corpus
    // replayed as a 4-batch file feed through flatMapGroupsWithState
    // (checkpointed per-fingerprint state, parquet sink), compared
    // against the BATCH dedup oracle. Batches are ascending doc_id
    // ranges with strictly ascending mtimes, so the batch holding a
    // fingerprint's minimal id always arrives first and the first-seen
    // winner equals the batch semantics (min doc_id per content) —
    // making the unbounded-feed operator exactly comparable ----
    Q("q104_streaming_dedup",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents").select($"doc_id", $"text")
        val feed = stageFileFeed(docs, nb = 4)
        val ckpt = graft.TempDirs.create("graft-q104-ckpt")
        val outDir = graft.TempDirs.create("graft-q104-out")
        val stream = s.readStream
          .schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(feed)
        val sq = graft.streaming.StatePartitions.sized(s, 8) {
          graft.streaming.StreamingDedup
            .keepers(stream, "text", "doc_id")
            .writeStream.outputMode("append").format("parquet")
            .option("checkpointLocation", ckpt)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(outDir)
        }
        sq.awaitTermination()
        s.read.schema("fingerprint STRING, keep_id BIGINT")
          .parquet(outDir)
          .orderBy($"fingerprint")
      },
      Some("""SELECT md5(regexp_replace(lower(trim(text)),
             |           '\s+', ' ', 'g')) AS fingerprint,
             |       min(doc_id) AS keep_id
             |FROM documents GROUP BY 1
             |ORDER BY fingerprint""".stripMargin)),

    // ---- q105: STREAMING LSH near-dup candidates, oracle-gated — the
    // same 4-batch replay through StreamingNearDup (per-(band,bucket)
    // state) -> parquet sink. A streaming pair is emitted once per
    // colliding band and whenever the LATER member arrives; the dedup'd
    // PAIR SET is what's gated. The cap stays at the production default
    // (uncapped, the sf1 bench corpus emits 1.0e9 pairs — 64x
    // superlinear; see Dedup scaladoc), and the ORACLE mirrors the
    // streaming cap rule exactly instead of being uncapped: a pair is
    // a candidate iff both members are within the first maxBucket ids
    // of a shared (band, bucket) — the id-ordered replay makes the
    // streaming prefix-cap identical to the id-rank filter, at ANY
    // scale factor. (Streaming emits per ANY admitted band; batch
    // dedups to the FIRST colliding band — the residual batch/stream
    // divergence under cross-band crowding is pinned in
    // StreamingSpec.) ----
    Q("q105_streaming_lsh",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents").select($"doc_id", $"text")
        val feed = stageFileFeed(docs, nb = 4)
        val ckpt = graft.TempDirs.create("graft-q105-ckpt")
        val outDir = graft.TempDirs.create("graft-q105-out")
        val stream = s.readStream
          .schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(feed)
        val sq = graft.streaming.StatePartitions.sized(s, 8) {
          graft.streaming.StreamingNearDup
            .candidatePairs(stream, "text", "doc_id",
              maxBucket = graft.llm.Dedup.DefaultMaxBucket)
            .writeStream.outputMode("append").format("parquet")
            .option("checkpointLocation", ckpt)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(outDir)
        }
        sq.awaitTermination()
        s.read.schema("a BIGINT, b BIGINT, band INT").parquet(outDir)
          .select($"a", $"b").dropDuplicates("a", "b")
          .orderBy($"a", $"b")
      },
      Some(s"""WITH ${dBandCtesFrom("documents")}
              |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              |FROM ranked x JOIN ranked y
              |  ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id
              |WHERE x.rk <= $dMaxBucket AND y.rk <= $dMaxBucket
              |ORDER BY a, b""".stripMargin)),

    // ---- q107: REAL image decode, oracle-gated — one true PNG per
    // document (pixels derived from the text by the shared pixelByte
    // rule), staged to parquet as stored binaries, then decoded back
    // through javax.imageio in mapPartitions. The oracle computes the
    // expected per-channel pixel sums from the TEXT alone (never
    // touching PNG), so an exact match proves the engine decoded real
    // codec bytes correctly — the formerly sandbox-blocked decode
    // surface, now closed (PNG is lossless; sums are exact BIGINTs) ----
    Q("q107_image_decode",
      (s, d) => {
        import s.implicits._
        val pngs = Multimodal.imagesFromText(
          T(s, d, "documents"), "text", "doc_id")
        // stage: decode must read REAL stored binaries, not an
        // in-memory column handed straight back
        val dir = graft.TempDirs.create("graft-q107-png")
        pngs.write.mode("overwrite").parquet(dir)
        Multimodal.imageChannelStats(
          s.read.schema("asset_id BIGINT, png BINARY").parquet(dir), "png",
            "asset_id")
          .select($"asset_id", $"w".cast("long").as("w"),
            $"h".cast("long").as("h"), $"sum_r", $"sum_g", $"sum_b")
          .orderBy($"asset_id")
      },
      Some("""WITH px AS (
             |  SELECT doc_id, text, length(text) AS len,
             |         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
             |  FROM documents WHERE length(text) > 0),
             |sums AS (
             |  SELECT doc_id, w, h,
             |    list_sum(list_transform(generate_series(0, w*h - 1),
             |      i -> unicode(text[CAST((3*i + 0) % len AS INT) + 1
             |                        : CAST((3*i + 0) % len AS INT) + 1])
             |           % 256)) AS sum_r,
             |    list_sum(list_transform(generate_series(0, w*h - 1),
             |      i -> unicode(text[CAST((3*i + 1) % len AS INT) + 1
             |                        : CAST((3*i + 1) % len AS INT) + 1])
             |           % 256)) AS sum_g,
             |    list_sum(list_transform(generate_series(0, w*h - 1),
             |      i -> unicode(text[CAST((3*i + 2) % len AS INT) + 1
             |                        : CAST((3*i + 2) % len AS INT) + 1])
             |           % 256)) AS sum_b
             |  FROM px)
             |SELECT doc_id AS asset_id, w, h,
             |       CAST(sum_r AS BIGINT) AS sum_r,
             |       CAST(sum_g AS BIGINT) AS sum_g,
             |       CAST(sum_b AS BIGINT) AS sum_b
             |FROM sums ORDER BY asset_id""".stripMargin)),

    // ---- q108: Bloom-prefiltered decontamination hit list. Same
    // contamination semantics as q63, different 100 TB plan: the
    // benchmark shingle union builds a ~10-bit/key Bloom filter
    // (bloom_agg, OR-merged partials) inlined as a literal, the
    // exploded train side is rejected MAP-SIDE by the codegen'd
    // bloom_contains probe below the verify join's exchange, and the
    // exact join then kills the Bloom's false positives — output is
    // exact at any SF (no cap/guardrail semantics to mirror: FPs are
    // provably removed), only the shuffled volume is probabilistic.
    // The oracle is the plain exact join the construct must equal ----
    Q("q108_bloom_decontaminate",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        Curate.contaminationHitsBloom(
            docs.where($"doc_id" % 50 =!= 0),
            docs.where($"doc_id" % 50 === 0),
            "text", "doc_id", ngram = 3)
          .orderBy($"doc_id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, $dShingles3 AS sh
              |           FROM documents),
              |bs AS (SELECT DISTINCT unnest(sh) AS h FROM sh
              |       WHERE doc_id % 50 = 0),
              |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 != 0),
              |shared AS (
              |  SELECT t.doc_id, count(*) AS ns
              |  FROM (SELECT doc_id, unnest(sh) AS h FROM tr) t
              |  JOIN bs USING (h)
              |  GROUP BY t.doc_id)
              |SELECT s.doc_id, CAST(len(tr.sh) AS BIGINT) AS n_sh,
              |  s.ns AS n_shared,
              |  round(CAST(s.ns AS DOUBLE) / len(tr.sh), 6) >= 0.5
              |    AS contaminated
              |FROM shared s JOIN tr ON tr.doc_id = s.doc_id
              |ORDER BY s.doc_id""".stripMargin)),

    // ---- q109: SemDeDup semantic dedup — distributed Lloyd's k-means
    // (deterministic first-k init, codegen'd ivf_assign argmax, exact
    // DECIMAL per-(cluster,dim) means rounded to 6 dp so both engines
    // iterate on bit-identical centroid matrices), then pairwise
    // cosine WITHIN clusters only, capped to each cluster's 48
    // smallest ids (cap semantics mirrored in the oracle's
    // row_number() <= 48), dropping the larger id of any pair >=
    // 0.25. The oracle unrolls the single Lloyd round in SQL,
    // including the empty-cluster keep-previous-centroid fallback ----
    Q("q109_semantic_dedup",
      (s, d) => {
        import s.implicits._
        Similarity.semanticDedup(T(s, d, "embeddings"),
            "embedding", "vec_id", k = 8, iters = 1,
            threshold = 0.25, maxCluster = 48)
          .orderBy($"vec_id")
      },
      Some("""WITH emb AS (SELECT vec_id,
             |    CAST(embedding AS DOUBLE[]) AS v, embedding
             |  FROM embeddings),
             |init AS (SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
             |    v AS cv
             |  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)),
             |p0 AS (SELECT e.vec_id, c.cidx,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      c.cv[CAST(j AS INT)] * e.v[CAST(j AS INT)])) AS dt,
             |    sqrt(list_sum(list_transform(c.cv, x -> x * x))) AS nc,
             |    sqrt(list_sum(list_transform(e.v, x -> x * x))) AS ne
             |  FROM emb e, init c),
             |a0 AS (SELECT vec_id, cidx FROM (
             |    SELECT vec_id, cidx, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY
             |        (CASE WHEN nc = 0 OR ne = 0 THEN 0
             |              ELSE dt / (nc * ne) END) DESC, cidx ASC) AS rk
             |    FROM p0) WHERE rk = 1),
             |m1 AS (SELECT a0.cidx, u.pos,
             |    round(CAST(sum(CAST(u.x AS DECIMAL(27,12))) AS DOUBLE)
             |      / count(*), 6) AS m
             |  FROM a0 JOIN (SELECT vec_id, unnest(embedding) AS x,
             |      generate_subscripts(embedding, 1) AS pos
             |    FROM emb) u USING (vec_id)
             |  GROUP BY a0.cidx, u.pos),
             |ipos AS (SELECT cidx, unnest(cv) AS x,
             |    generate_subscripts(cv, 1) AS pos FROM init),
             |c1 AS (SELECT ipos.cidx,
             |    list(coalesce(m1.m, ipos.x) ORDER BY ipos.pos) AS cv
             |  FROM ipos LEFT JOIN m1
             |    ON m1.cidx = ipos.cidx AND m1.pos = ipos.pos
             |  GROUP BY ipos.cidx),
             |p1 AS (SELECT e.vec_id, c.cidx,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      c.cv[CAST(j AS INT)] * e.v[CAST(j AS INT)])) AS dt,
             |    sqrt(list_sum(list_transform(c.cv, x -> x * x))) AS nc,
             |    sqrt(list_sum(list_transform(e.v, x -> x * x))) AS ne
             |  FROM emb e, c1 c),
             |a1 AS (SELECT vec_id, cidx FROM (
             |    SELECT vec_id, cidx, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY
             |        (CASE WHEN nc = 0 OR ne = 0 THEN 0
             |              ELSE dt / (nc * ne) END) DESC, cidx ASC) AS rk
             |    FROM p1) WHERE rk = 1),
             |ranked AS (SELECT vec_id, cidx, row_number() OVER (
             |    PARTITION BY cidx ORDER BY vec_id) AS rk FROM a1),
             |head AS (SELECT r.vec_id, r.cidx, e.v
             |  FROM ranked r JOIN emb e USING (vec_id) WHERE r.rk <= 48),
             |pairs AS (SELECT s.yid AS b,
             |    round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             |           ELSE dt / (nx * ny) END), 6) AS score
             |  FROM (SELECT y.vec_id AS yid,
             |      list_sum(list_transform(generate_series(1, 64), j ->
             |        x.v[CAST(j AS INT)] * y.v[CAST(j AS INT)])) AS dt,
             |      sqrt(list_sum(list_transform(x.v, t -> t * t))) AS nx,
             |      sqrt(list_sum(list_transform(y.v, t -> t * t))) AS ny
             |    FROM head x JOIN head y
             |      ON x.cidx = y.cidx AND x.vec_id < y.vec_id) s),
             |dropped AS (SELECT DISTINCT b FROM pairs
             |  WHERE score >= 0.25)
             |SELECT a1.vec_id, CAST(a1.cidx AS BIGINT) AS cluster,
             |  (d.b IS NULL) AS kept
             |FROM a1 LEFT JOIN dropped d ON d.b = a1.vec_id
             |ORDER BY a1.vec_id""".stripMargin)),

    // ---- q110: heavy-hitter word trigrams via a count-min-sketch
    // prefilter (Cormode-Muthukrishnan two-pass): pass 1 sketches every
    // occurrence hash (partials ADD, single-row shuffle of sketch
    // bytes), pass 2 drops light occurrences MAP-SIDE below the exact
    // count's exchange. CMS never undercounts, so candidates are a
    // superset of the true heavy hitters and the exact count's HAVING
    // makes the output exact at any SF — the oracle is the plain
    // GROUP BY ... HAVING the construct must equal; the sketch hash
    // is engine-internal and never oracle-visible ----
    Q("q110_heavy_hitters",
      (s, d) => {
        import s.implicits._
        Curate.heavyHitterNgrams(T(s, d, "documents"), "text",
            n = 3, minCount = 5L)
          .orderBy($"gram")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $dTokens AS t
              |             FROM documents),
              |occ AS (
              |  SELECT unnest(list_transform(
              |    generate_series(1, len(t) - 2),
              |    i -> t[CAST(i AS INT)] || ' ' ||
              |         t[CAST(i AS INT) + 1] || ' ' ||
              |         t[CAST(i AS INT) + 2])) AS gram
              |  FROM toks WHERE len(t) >= 3)
              |SELECT gram, count(*) AS n FROM occ
              |GROUP BY gram HAVING count(*) >= 5
              |ORDER BY gram""".stripMargin)),

    // ---- q111: bigram-LM familiarity — the conditional-probability
    // step up from q65's unigram score (the CCNet-style LM quality
    // filter, minus the external model). Per bigram occurrence the MLE
    // P(w2|w1) is c(bigram)/c(context); the per-doc score is the
    // ratio-of-sums Σc(bigram)/Σc(context) — BOTH numerator and
    // denominator are EXACT integer sums, so the score is
    // partitioning-independent and ln-free (libm-drift rule). The
    // occurrence table feeds three hash-aggs (bigram counts, context
    // counts, per-doc sums) — all map-side partial, joins are
    // vocabulary-sized so deliberately NOT broadcast (corpus-
    // proportional; sort-merge scales). At 100 TB stage `occ` to
    // parquet once instead of recomputing the tokenize lineage ----
    Q("q111_bigram_familiarity",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val occ = docs
          .select($"doc_id", TextFunctions.tokens($"text").as("t"))
          .where(size($"t") >= 2)
          .select($"doc_id", explode(zip_with(
            slice($"t", lit(1), size($"t") - 1),
            slice($"t", lit(2), size($"t") - 1),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .select($"doc_id", $"bigram",
            split($"bigram", " ").getItem(0).as("w1"))
        val bc = occ.groupBy($"bigram").agg(count(lit(1)).as("cb"))
        val cc = occ.groupBy($"w1").agg(count(lit(1)).as("cw"))
        val ds = occ.join(bc, "bigram").join(cc, "w1")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n"), sum($"cb").as("sb"),
            sum($"cw").as("sc"))
        docs.select($"doc_id").join(ds, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"n", lit(0L)).as("n_bigrams"),
            coalesce($"sb", lit(0L)).as("sum_bigram_freq"),
            coalesce($"sc", lit(0L)).as("sum_ctx_freq"),
            when(coalesce($"n", lit(0L)) > 0,
              round($"sb".cast("double") / $"sc".cast("double"), 6))
              .otherwise(lit(0.0)).as("bigram_familiarity"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $dTokens AS t
              |             FROM documents),
              |occ0 AS (
              |  SELECT doc_id, unnest(list_transform(
              |    generate_series(1, len(t) - 1),
              |    i -> t[CAST(i AS INT)] || ' ' ||
              |         t[CAST(i AS INT) + 1])) AS bigram
              |  FROM toks WHERE len(t) >= 2),
              |occ AS (SELECT doc_id, bigram,
              |         split_part(bigram, ' ', 1) AS w1 FROM occ0),
              |bc AS (SELECT bigram, count(*) AS cb FROM occ
              |       GROUP BY bigram),
              |cc AS (SELECT w1, count(*) AS cw FROM occ GROUP BY w1),
              |ds AS (SELECT occ.doc_id, count(*) AS n,
              |         CAST(sum(bc.cb) AS BIGINT) AS sb,
              |         CAST(sum(cc.cw) AS BIGINT) AS sc
              |       FROM occ JOIN bc USING (bigram) JOIN cc USING (w1)
              |       GROUP BY occ.doc_id)
              |SELECT d.doc_id,
              |  coalesce(ds.n, 0) AS n_bigrams,
              |  coalesce(ds.sb, 0) AS sum_bigram_freq,
              |  coalesce(ds.sc, 0) AS sum_ctx_freq,
              |  CASE WHEN coalesce(ds.n, 0) > 0 THEN
              |    round(CAST(ds.sb AS DOUBLE) / CAST(ds.sc AS DOUBLE), 6)
              |  ELSE 0.0 END AS bigram_familiarity
              |FROM documents d LEFT JOIN ds ON d.doc_id = ds.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- q112: mergeable HLL cardinality sketches — the 100 TB answer
    // to countDistinct. Per-source Datasketches HLL sketches (partials
    // merge map-side, the shuffle moves KB-sized sketch bytes, never
    // values) are UNIONED via hll_union_agg into the corpus-wide 'ALL'
    // row — the mergeability that lets 1000 executors sketch shards
    // independently. The oracle-checked contract: the exact distinct
    // count (BIGINT, exact on both engines) plus `est_ok`, the
    // accuracy gate |est - exact| <= 5% * exact (lgK=12 gives ~1.6%
    // standard error, so the gate holds at any SF; the estimate itself
    // is engine-internal and never oracle-visible) ----
    Q("q112_sketch_distinct",
      (s, d) => {
        import s.implicits._
        val f = T(s, d, "documents").select($"source",
          TextFunctions.fingerprint($"text").as("fp"))
        val per = f.groupBy($"source").agg(
          countDistinct($"fp").as("n_exact"),
          hll_sketch_agg($"fp", lit(12)).as("sk"))
        def gate(est: org.apache.spark.sql.Column,
                 exact: org.apache.spark.sql.Column)
            : org.apache.spark.sql.Column =
          abs(est.cast("double") - exact.cast("double")) <=
            exact.cast("double") * 0.05
        val perOut = per.select($"source", $"n_exact",
          gate(hll_sketch_estimate($"sk"), $"n_exact").as("est_ok"))
        val allRow = f.agg(countDistinct($"fp").as("n_exact"))
          .crossJoin(per.agg(
            hll_union_agg($"sk", lit(false)).as("sk")))
          .select(lit("ALL").as("source"), $"n_exact",
            gate(hll_sketch_estimate($"sk"), $"n_exact").as("est_ok"))
        perOut.unionByName(allRow).orderBy($"source")
      },
      Some("""WITH f AS (SELECT source,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    AS fp FROM documents),
             |per AS (SELECT source, count(DISTINCT fp) AS n_exact
             |        FROM f GROUP BY source),
             |tot AS (SELECT count(DISTINCT fp) AS n_exact FROM f)
             |SELECT source, n_exact, true AS est_ok FROM per
             |UNION ALL SELECT 'ALL' AS source, n_exact, true FROM tot
             |ORDER BY source""".stripMargin)),

    // ---- q113: GK quantile sketch — the scale path q64's comment
    // promises. percentile_approx (Greenwald-Khanna, accuracy 10000:
    // rank error <= n/10000, sketch partials merge map-side) next to
    // the exact interpolated deciles. Oracle-checked contract: the
    // exact decile values plus `approx_ok`, gating the sketch value
    // into the exact quantile envelope at p +/- 0.004 (> one rank step
    // at sf0.01's n=500 and the rank-error bound at any larger SF; the
    // sketch value itself is engine-internal, never oracle-visible) ----
    Q("q113_quantile_sketch",
      (s, d) => {
        import s.implicits._
        val ps = (1 to 9).map(_ / 10.0)
        val lo = ps.map(p => math.max(0.0, p - 0.004))
        val hi = ps.map(p => math.min(1.0, p + 0.004))
        T(s, d, "documents")
          .agg(percentile($"n_chars", typedlit(ps)).as("ex"),
            percentile($"n_chars", typedlit(lo)).as("exlo"),
            percentile($"n_chars", typedlit(hi)).as("exhi"),
            percentile_approx($"n_chars", typedlit(ps), lit(10000))
              .as("ap"))
          .select(posexplode(arrays_zip($"ex", $"exlo", $"exhi", $"ap")))
          .select(($"pos" + 1).cast("long").as("decile"),
            round($"col.ex", 6).as("n_chars_q"),
            ($"col.ap".cast("double") >= $"col.exlo" &&
              $"col.ap".cast("double") <= $"col.exhi").as("approx_ok"))
          .orderBy($"decile")
      },
      Some("""WITH q AS (SELECT quantile_cont(n_chars,
             |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
             |  FROM documents)
             |SELECT CAST(generate_subscripts(qs, 1) AS BIGINT) AS decile,
             |  round(unnest(qs), 6) AS n_chars_q,
             |  true AS approx_ok
             |FROM q ORDER BY decile""".stripMargin)),

    // ---- q116: REAL audio decode, oracle-gated — one true RIFF/WAVE
    // clip per document (16-bit mono PCM samples derived from the text
    // by the shared sampleValue rule), staged to parquet as stored
    // binaries, then decoded back through javax.sound.sampled. The
    // oracle computes the expected sample sums from the TEXT alone
    // (never touching WAV), so an exact match proves the engine decoded
    // real codec bytes correctly — closes the audio half of the media
    // stub the same way q107 closed images (PCM is lossless; sums are
    // exact BIGINTs). Video remains the only stubbed decode ----
    Q("q116_audio_decode",
      (s, d) => {
        import s.implicits._
        val wavs = Multimodal.wavFromText(
          T(s, d, "documents"), "text", "doc_id")
        // stage: decode must read REAL stored binaries, not an
        // in-memory column handed straight back
        val dir = graft.TempDirs.create("graft-q116-wav")
        wavs.write.mode("overwrite").parquet(dir)
        Multimodal.audioSampleStats(
          s.read.schema("asset_id BIGINT, wav BINARY").parquet(dir), "wav",
            "asset_id")
          .toDF()
          .orderBy($"asset_id")
      },
      Some("""WITH au AS (
             |  SELECT doc_id, text, length(text) AS len,
             |         160 + doc_id % 5 * 40 AS n
             |  FROM documents WHERE length(text) > 0),
             |sums AS (
             |  SELECT doc_id, n,
             |    list_sum(list_transform(generate_series(0,
             |        CAST(n - 1 AS INT)),
             |      i -> (unicode(text[CAST(i % len AS INT) + 1
             |                         : CAST(i % len AS INT) + 1])
             |            % 256 - 128) * 256)) AS s,
             |    list_sum(list_transform(generate_series(0,
             |        CAST(n - 1 AS INT)),
             |      i -> abs((unicode(text[CAST(i % len AS INT) + 1
             |                             : CAST(i % len AS INT) + 1])
             |                % 256 - 128) * 256))) AS sa
             |  FROM au)
             |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_samples,
             |       CAST(8000 AS BIGINT) AS sample_rate,
             |       CAST(s AS BIGINT) AS sum_samples,
             |       CAST(sa AS BIGINT) AS sum_abs
             |FROM sums ORDER BY asset_id""".stripMargin)),

    // ---- q117: per-document n-gram novelty — the "how much of this
    // doc is new text" curation signal (dedup's soft sibling: a doc
    // whose grams all first appeared in EARLIER docs is boilerplate
    // even if no single pair crosses the near-dup threshold). Shape:
    // distinct trigrams per doc (native ngram_join kernel), one
    // hash-agg for the corpus-wide first-occurrence doc (min doc_id —
    // associative, partial map-side), one join back, one per-doc agg.
    // No window over the full gram stream, no self-join; at 100 TB the
    // first-occurrence table is vocabulary-sized and the join is
    // sort-merge on gram ----
    Q("q117_gram_novelty",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val dg = docs
          .select($"doc_id", explode(array_distinct(
            call_function("ngram_join",
              TextFunctions.tokens($"text"), lit(3)))).as("gram"))
        val first = dg.groupBy($"gram")
          .agg(min($"doc_id").as("first_doc"))
        val per = dg.join(first, "gram")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
              .as("n_novel"))
        docs.select($"doc_id").join(per, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"n_grams", lit(0L)).as("n_grams"),
            coalesce($"n_novel", lit(0L)).as("n_novel"),
            when(coalesce($"n_grams", lit(0L)) > 0,
              round($"n_novel".cast("double") /
                $"n_grams".cast("double"), 6))
              .otherwise(lit(0.0)).as("novelty"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $dTokens AS t
              |             FROM documents),
              |dg AS (SELECT DISTINCT doc_id, gram FROM (
              |  SELECT doc_id, unnest(list_transform(
              |    generate_series(1, len(t) - 2),
              |    i -> t[CAST(i AS INT)] || ' ' ||
              |         t[CAST(i AS INT) + 1] || ' ' ||
              |         t[CAST(i AS INT) + 2])) AS gram
              |  FROM toks WHERE len(t) >= 3)),
              |first AS (SELECT gram, min(doc_id) AS first_doc
              |          FROM dg GROUP BY gram),
              |per AS (SELECT dg.doc_id, count(*) AS n_grams,
              |  CAST(sum(CASE WHEN f.first_doc = dg.doc_id
              |                THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
              |  FROM dg JOIN first f USING (gram) GROUP BY dg.doc_id)
              |SELECT d.doc_id,
              |  coalesce(per.n_grams, 0) AS n_grams,
              |  coalesce(per.n_novel, 0) AS n_novel,
              |  CASE WHEN coalesce(per.n_grams, 0) > 0 THEN
              |    round(CAST(per.n_novel AS DOUBLE) /
              |          CAST(per.n_grams AS DOUBLE), 6)
              |  ELSE 0.0 END AS novelty
              |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- q118: deterministic stratified sampling — the corpus
    // downsampling step every mix/ablation pipeline needs. Per-source
    // quota = max(1, n_src div 10) (exact 10% floor, never an empty
    // stratum); membership is decided by ranking on a salted md5 of
    // the id — deterministic across engines, partitions and reruns,
    // uniform within each stratum, and reproducible at any scale (the
    // hash-order rank is the distributed analogue of a seeded
    // reservoir). One count agg + one per-stratum window; no global
    // sort, no driver state ----
    Q("q118_stratified_sample",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        val cnts = docs.groupBy($"source")
          .agg(count(lit(1)).as("n_src"))
        val w = Window.partitionBy($"source")
          .orderBy(md5(concat(lit("graft"), $"doc_id".cast("string"))),
            $"doc_id")
        docs.join(cnts, "source")
          .withColumn("rn", row_number().over(w).cast("long"))
          .where($"rn" <= greatest(lit(1L), expr("n_src div 10")))
          .select($"source", $"doc_id", $"rn")
          .orderBy($"source", $"rn")
      },
      Some("""WITH c AS (SELECT source, count(*) AS n_src
             |          FROM documents GROUP BY source),
             |r AS (SELECT d.source, d.doc_id, c.n_src,
             |  CAST(row_number() OVER (PARTITION BY d.source
             |    ORDER BY md5('graft' || CAST(d.doc_id AS VARCHAR)),
             |             d.doc_id) AS BIGINT) AS rn
             |  FROM documents d JOIN c USING (source))
             |SELECT source, doc_id, rn FROM r
             |WHERE rn <= greatest(1, n_src // 10)
             |ORDER BY source, rn""".stripMargin)),

    // ---- q119: PageRank over the kNN similarity graph (q92's edges)
    // — graph centrality as a curation signal (a doc central in the
    // similarity graph is representative; a peripheral one is an
    // outlier). All arithmetic is INTEGER (ranks live at scale 1e12;
    // contributions are (r*85) div 100 div deg) so three unrolled
    // iterations are bit-exact on both engines — no double sums, no
    // libm. Shape per iteration: edges join ranks (co-keyed on src)
    // -> per-dst sum -> left join back to nodes; the node set and
    // degree table are computed once. At 100 TB: ranks and edges
    // co-partition on src/dst, each iteration is one shuffle; the
    // 1-row node count crossJoin is a scalar broadcast ----
    Q("q119_pagerank",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        val edges = Similarity.stagedKnnEdges(emb, 3, d)
          .select($"src", $"dst") // staged parquet: lineage already cut
        val nodes = edges.select($"src".as("id"))
          .union(edges.select($"dst".as("id"))).distinct()
        val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        val n1 = nodes.agg(count(lit(1)).as("n")) // 1-row scalar
        val base = nodes.crossJoin(n1)
          .select($"id", expr("((1000000000000L div n) * 15) div 100")
            .as("b"))
        var ranks = nodes.crossJoin(n1)
          .select($"id", expr("1000000000000L div n").as("r"))
        for (_ <- 1 to 3) {
          val contrib = edges
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select($"dst".as("id"),
              expr("((r * 85L) div 100) div deg").as("c"))
          val sums = contrib.groupBy($"id").agg(sum($"c").as("sc"))
          ranks = base.join(sums, Seq("id"), "left")
            .select($"id", ($"b" + coalesce($"sc", lit(0L))).as("r"))
        }
        ranks.select($"id", $"r".as("pagerank")).orderBy($"id")
      },
      Some("""WITH e AS (SELECT vec_id,
             |            CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |q AS (SELECT vec_id AS src, v AS qv FROM e
             |      WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |sc AS (SELECT q.src, e.vec_id AS dst,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM e, q WHERE e.vec_id != q.src),
             |scored AS (SELECT src, dst,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |  FROM sc),
             |edges AS (SELECT src, dst FROM (
             |  SELECT src, dst, row_number() OVER (PARTITION BY src
             |    ORDER BY score DESC, dst ASC) AS rank FROM scored)
             |  WHERE rank <= 3),
             |nodes AS (SELECT DISTINCT id FROM (
             |  SELECT src AS id FROM edges
             |  UNION ALL SELECT dst FROM edges)),
             |nn AS (SELECT count(*) AS n FROM nodes),
             |deg AS (SELECT src, count(*) AS deg FROM edges
             |        GROUP BY src),
             |base AS (SELECT id, ((1000000000000 // n) * 15) // 100
             |           AS b FROM nodes, nn),
             |r0 AS (SELECT id, 1000000000000 // n AS r FROM nodes, nn),
             |c1 AS (SELECT e.dst AS id,
             |  CAST(sum(((r.r * 85) // 100) // d.deg) AS BIGINT) AS sc
             |  FROM edges e JOIN r0 r ON r.id = e.src
             |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
             |r1 AS (SELECT base.id, base.b + coalesce(c1.sc, 0) AS r
             |       FROM base LEFT JOIN c1 ON c1.id = base.id),
             |c2 AS (SELECT e.dst AS id,
             |  CAST(sum(((r.r * 85) // 100) // d.deg) AS BIGINT) AS sc
             |  FROM edges e JOIN r1 r ON r.id = e.src
             |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
             |r2 AS (SELECT base.id, base.b + coalesce(c2.sc, 0) AS r
             |       FROM base LEFT JOIN c2 ON c2.id = base.id),
             |c3 AS (SELECT e.dst AS id,
             |  CAST(sum(((r.r * 85) // 100) // d.deg) AS BIGINT) AS sc
             |  FROM edges e JOIN r2 r ON r.id = e.src
             |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
             |r3 AS (SELECT base.id, base.b + coalesce(c3.sc, 0) AS r
             |       FROM base LEFT JOIN c3 ON c3.id = base.id)
             |SELECT id, CAST(r AS BIGINT) AS pagerank FROM r3
             |ORDER BY id""".stripMargin)),

    // ---- q120: product-quantization ANN (ADC) — the memory-bound
    // scale path beyond q49's IVF: a 64-dim float vector (256 B)
    // becomes 4 small ints. Codebooks are the first 8 vectors by id
    // split into 4 x 16-dim subspaces (deterministic quantizer, the
    // ivfCentroids convention); encoding is the native pq_encode
    // squared-L2 argmin (map-side, codegen'd); the query never touches
    // vectors at scan time — ADC sums 4 driver-computed lookup-table
    // literals per row. Ranking uses the 6dp-rounded estimate with
    // vec_id tiebreak (the q92 determinism rule); the oracle rebuilds
    // codebooks, codes and the LUT from the same literals, summing
    // subspace distances in s-order via list(ORDER BY) for the
    // identical left fold ----
    Q("q120_pq_ann",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
        val query = emb.where($"vec_id" === 0L)
          .select($"embedding".cast("array<double>")).head()
          .getSeq[Double](0)
        val books = Similarity.pqCodebooks(emb, "embedding", "vec_id",
          m = 4, k = 8)
        val encoded = Similarity.pqEncodeDf(emb, "embedding", "vec_id",
          books)
        Similarity.pqTopK(encoded, query, books, k = 20)
      },
      Some("""WITH cb AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) AS cid,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM (SELECT vec_id, embedding FROM embeddings
             |        ORDER BY vec_id LIMIT 8)),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |      FROM embeddings),
             |ss AS (SELECT unnest(generate_series(0, 3)) AS s),
             |pd AS (
             |  SELECT e.vec_id, ss.s, cb.cid,
             |    list_sum(list_transform(generate_series(1, 16), j ->
             |      (v[CAST(ss.s * 16 + j AS INT)]
             |        - cv[CAST(ss.s * 16 + j AS INT)])
             |      * (v[CAST(ss.s * 16 + j AS INT)]
             |        - cv[CAST(ss.s * 16 + j AS INT)]))) AS dist
             |  FROM e, ss, cb),
             |codes AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT vec_id, s, cid, row_number() OVER (
             |      PARTITION BY vec_id, s
             |      ORDER BY dist ASC, cid ASC) AS rk FROM pd)
             |  WHERE rk = 1),
             |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             |      FROM embeddings WHERE vec_id = 0),
             |lut AS (
             |  SELECT ss.s, cb.cid,
             |    list_sum(list_transform(generate_series(1, 16), j ->
             |      (qv[CAST(ss.s * 16 + j AS INT)]
             |        - cv[CAST(ss.s * 16 + j AS INT)])
             |      * (qv[CAST(ss.s * 16 + j AS INT)]
             |        - cv[CAST(ss.s * 16 + j AS INT)]))) AS dist
             |  FROM q, ss, cb),
             |est AS (
             |  SELECT c.vec_id,
             |    array_to_string(list(CAST(c.cid AS VARCHAR)
             |      ORDER BY c.s), '-') AS codes,
             |    round(list_sum(list(l.dist ORDER BY c.s)), 6) AS est
             |  FROM codes c JOIN lut l ON l.s = c.s AND l.cid = c.cid
             |  GROUP BY c.vec_id)
             |SELECT vec_id, codes, est FROM est
             |ORDER BY est ASC, vec_id LIMIT 20""".stripMargin)),

    // ---- q121: contrastive triplet mining — the hard-negative
    // selection step of embedding-model training data: for each
    // sampled anchor, the positive is its nearest same-label
    // neighbour, the negative its nearest OTHER-label neighbour, and
    // margin = pos - neg ranks how informative the triplet is (small
    // or negative margin = hard example). Shape: a BOUNDED anchor
    // batch (1-in-25 of the first 5000 ids — constant-size at any SF,
    // the training-mini-batch shape that keeps the scan linear in N)
    // broadcast (stats-gated, degrades to shuffle join) against one
    // candidate scan; per-(anchor, same?) top-1 via a 2|A|-partition
    // window. Scores go through the codegen'd cosine_sim kernel and
    // 6-dp rounding before ranking, so the order is engine-identical ----
    Q("q121_triplet_mining",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"label",
            $"embedding".cast("array<double>").as("v"))
        val anch = emb.where($"vec_id" % 25 === 0 &&
            $"vec_id" < Similarity.MaxAnchorId)
          .select($"vec_id".as("anchor"), $"label".as("albl"),
            $"v".as("qv"))
        val est = anch.queryExecution.optimizedPlan.stats.sizeInBytes
        val hinted = if (est <= (64L << 20)) broadcast(anch) else anch
        val scored = emb.join(hinted, $"vec_id" =!= $"anchor")
          .select($"anchor", $"vec_id",
            ($"label" === $"albl").as("same"),
            round(call_function("cosine_sim", $"v", $"qv"), 6)
              .as("score"))
        // one pass: top-1 per (anchor, same?) as a HASH AGGREGATE —
        // max over struct(score, -vec_id) is the deterministic argmax
        // (score desc, vec_id asc tiebreak) with MAP-SIDE partial
        // aggregation, so the N*|A| scored stream reduces to <= 2|A|
        // rows per task before any exchange. The prior window
        // formulation shuffled + sorted the entire scored stream
        // (40M rows at sf10 — the suite's one superlinear decade-2
        // row, 15.2x; a pos/neg self-join would be worse still,
        // recomputing the broadcast cross product twice)
        scored
          .groupBy($"anchor", $"same")
          .agg(max(struct($"score", (-$"vec_id").as("nvi"),
            $"vec_id".as("vec_id"))).as("b"))
          .groupBy($"anchor")
          .agg(max(when($"same", struct($"b.vec_id".as("vec_id"),
              $"b.score".as("score")))).as("p"),
            max(when(!$"same", struct($"b.vec_id".as("vec_id"),
              $"b.score".as("score")))).as("ng"))
          .where($"p".isNotNull && $"ng".isNotNull)
          .select($"anchor",
            $"p.vec_id".as("pos_id"), $"p.score".as("pos_score"),
            $"ng.vec_id".as("neg_id"), $"ng.score".as("neg_score"),
            round($"p.score" - $"ng.score", 6).as("margin"))
          .orderBy($"anchor")
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |            CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |a AS (SELECT vec_id AS anchor, label AS albl, v AS qv
             |      FROM e WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |sc AS (SELECT a.anchor, e.vec_id,
             |  (e.label = a.albl) AS same,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM e, a WHERE e.vec_id != a.anchor),
             |scored AS (SELECT anchor, vec_id, same,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |  FROM sc),
             |best AS (SELECT anchor, vec_id, same, score FROM (
             |  SELECT anchor, vec_id, same, score,
             |    row_number() OVER (PARTITION BY anchor, same
             |      ORDER BY score DESC, vec_id ASC) AS rk
             |  FROM scored) WHERE rk = 1)
             |SELECT p.anchor, p.vec_id AS pos_id, p.score AS pos_score,
             |  n.vec_id AS neg_id, n.score AS neg_score,
             |  round(p.score - n.score, 6) AS margin
             |FROM best p JOIN best n
             |  ON p.anchor = n.anchor AND p.same AND NOT n.same
             |ORDER BY p.anchor""".stripMargin)),

    // ---- q122: positional inverted index + exact phrase query — the
    // search-side operator every corpus-exploration UI needs. The
    // postings relation (term, doc_id, pos) is the index; a k-word
    // phrase is a (k-1)-way self-join on doc_id with pos adjacency.
    // At 100 TB the postings table is bucketed by term so the p1/p2
    // selections are partition-pruned scans and the adjacency join is
    // co-keyed on doc_id (one shuffle); here both selections come off
    // one posexplode projection ----
    Q("q122_phrase_search",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val post = docs
          .select($"doc_id", posexplode(TextFunctions.tokens($"text")))
          .toDF("doc_id", "pos", "term")
        val p1 = post.where($"term" === "table")
          .select($"doc_id", $"pos")
        val p2 = post.where($"term" === "value")
          .select($"doc_id".as("d2"), $"pos".as("pos2"))
        p1.join(p2, $"doc_id" === $"d2" && $"pos2" === $"pos" + 1)
          .groupBy($"doc_id").agg(count(lit(1)).as("hits"))
          .orderBy($"hits".desc, $"doc_id")
          .limit(20)
      },
      Some(s"""WITH toks AS (SELECT doc_id, $dTokens AS t
              |             FROM documents),
              |p1 AS (SELECT doc_id,
              |  unnest(list_filter(generate_series(1, len(t)),
              |    i -> t[CAST(i AS INT)] = 'table')) AS pos
              |  FROM toks),
              |p2 AS (SELECT doc_id,
              |  unnest(list_filter(generate_series(1, len(t)),
              |    i -> t[CAST(i AS INT)] = 'value')) AS pos
              |  FROM toks)
              |SELECT p1.doc_id, CAST(count(*) AS BIGINT) AS hits
              |FROM p1 JOIN p2
              |  ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
              |GROUP BY p1.doc_id
              |ORDER BY hits DESC, p1.doc_id LIMIT 20""".stripMargin)),

    // ---- q123: per-dimension embedding column profile (mean/std/
    // min/max over each of the 64 dims) — the feature-drift monitor a
    // training pipeline runs per shard. Exactness trick: floats are
    // quantized to exact 1e-6-scaled BIGINTs FIRST (round() of an
    // identical IEEE product is engine-identical), so the grouped sums
    // are order-independent integer arithmetic — no float-sum
    // nondeterminism — and the final mean/std math is one identical
    // double expression on both engines. One 64-key shuffle with
    // map-side partial aggs; sums stay in BIGINT range through sf10
    // (9e12 per element; switch to DECIMAL at larger corpora) ----
    Q("q123_embedding_stats",
      (s, d) => {
        import s.implicits._
        val x = T(s, d, "embeddings")
          .select(posexplode($"embedding".cast("array<double>")))
          .toDF("dim0", "x")
          .select(($"dim0" + 1).cast("long").as("dim"),
            round($"x" * 1e6, 0).cast("long").as("xi"))
        x.groupBy($"dim")
          .agg(count(lit(1)).as("n"), sum($"xi").as("si"),
            sum($"xi" * $"xi").as("ssi"),
            min($"xi").as("mni"), max($"xi").as("mxi"))
          .withColumn("mean_raw",
            $"si".cast("double") / $"n" / lit(1e6))
          .select($"dim", $"n",
            round($"mean_raw", 6).as("mean"),
            round(sqrt(greatest(
              $"ssi".cast("double") / $"n" / lit(1e12) -
                $"mean_raw" * $"mean_raw", lit(0.0))), 6).as("std"),
            round($"mni".cast("double") / 1e6, 6).as("min_v"),
            round($"mxi".cast("double") / 1e6, 6).as("max_v"))
          .orderBy($"dim")
      },
      Some("""WITH ds AS (SELECT unnest(generate_series(1, 64)) AS i),
             |x AS (SELECT ds.i AS dim,
             |  CAST(round(CAST(e.embedding[CAST(ds.i AS INT)] AS DOUBLE)
             |       * 1e6) AS BIGINT) AS xi
             |  FROM embeddings e, ds),
             |a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(xi) AS DOUBLE) AS si,
             |  CAST(sum(xi * xi) AS DOUBLE) AS ssi,
             |  min(xi) AS mni, max(xi) AS mxi
             |  FROM x GROUP BY dim),
             |m AS (SELECT dim, n, si / n / 1e6 AS mean_raw,
             |             ssi, mni, mxi FROM a)
             |SELECT CAST(dim AS BIGINT) AS dim, n,
             |  round(mean_raw, 6) AS mean,
             |  round(sqrt(greatest(ssi / n / 1e12
             |    - mean_raw * mean_raw, 0.0)), 6) AS std,
             |  round(CAST(mni AS DOUBLE) / 1e6, 6) AS min_v,
             |  round(CAST(mxi AS DOUBLE) / 1e6, 6) AS max_v
             |FROM m ORDER BY dim""".stripMargin)),

    // ---- q124: canonicalization-aware exact dedup — normalize the
    // text (drop the pure-function-word tokens 'a'/'the') BEFORE
    // hashing, so documents that differ only in those words collapse
    // to one canonical group; min-id wins, group size reported. This
    // is the normalize-then-hash step every exact-dedup pipeline runs
    // ahead of q20's raw md5 (casefolding/whitespace are already
    // canonical in this corpus, so stopword removal is the
    // demonstrable normalization). Same scale shape as q20: one
    // hash-agg on the canonical fingerprint ----
    Q("q124_canonical_dedup",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        docs.select($"doc_id",
            md5(array_join(filter(TextFunctions.tokens($"text"),
              t => t =!= "a" && t =!= "the"), " ")).as("canon"))
          .groupBy($"canon")
          .agg(min($"doc_id").as("keep_id"),
            count(lit(1)).as("n_docs"))
          .select($"keep_id", $"canon", $"n_docs")
          .orderBy($"keep_id")
      },
      Some(s"""WITH c AS (SELECT doc_id,
              |  md5(array_to_string(list_filter($dTokens,
              |    t -> t != 'a' AND t != 'the'), ' ')) AS canon
              |  FROM documents)
              |SELECT min(doc_id) AS keep_id, canon,
              |  CAST(count(*) AS BIGINT) AS n_docs
              |FROM c GROUP BY canon ORDER BY keep_id""".stripMargin)),

    // ---- q126: perceptual-hash image dedup over REAL decoded pixels
    // — the multimodal near-dup operator: encode real PNGs (q107's
    // generator), stage them, decode through javax.imageio, compute an
    // integer average-hash (bit i = pixel i's luminance strictly above
    // the image mean, decided as n*L_i > sum(L) so no float mean), and
    // group identical (w, h, ahash) triples into perceptual-duplicate
    // clusters. The oracle recomputes the identical hash from the
    // source text without touching PNG bytes, so the gate proves the
    // real codec round-trip. Scale shape: decode is mapPartitions over
    // columnar binaries (one codec init per partition), then one
    // hash-agg on a 3-column key ----
    Q("q126_phash_dedup",
      (s, d) => {
        import s.implicits._
        val pngs = Multimodal.imagesFromText(
          T(s, d, "documents"), "text", "doc_id")
        val dir = graft.TempDirs.create("graft-q126-png")
        pngs.write.mode("overwrite").parquet(dir)
        Multimodal.imageAHash(
          s.read.schema("asset_id BIGINT, png BINARY").parquet(dir),
          "png", "asset_id")
          .groupBy($"w", $"h", $"ahash")
          .agg(min($"asset_id").as("keep_id"),
            count(lit(1)).as("n_imgs"))
          .select($"keep_id", $"w".cast("long").as("w"),
            $"h".cast("long").as("h"), $"ahash", $"n_imgs")
          .orderBy($"keep_id")
      },
      Some("""WITH px AS (
             |  SELECT doc_id, text, length(text) AS len,
             |         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
             |  FROM documents WHERE length(text) > 0),
             |lum AS (
             |  SELECT doc_id, w, h, w*h AS n,
             |    list_transform(generate_series(0, w*h - 1), i ->
             |      unicode(text[CAST((3*i + 0) % len AS INT) + 1
             |                   : CAST((3*i + 0) % len AS INT) + 1]) % 256
             |    + unicode(text[CAST((3*i + 1) % len AS INT) + 1
             |                   : CAST((3*i + 1) % len AS INT) + 1]) % 256
             |    + unicode(text[CAST((3*i + 2) % len AS INT) + 1
             |                   : CAST((3*i + 2) % len AS INT) + 1]) % 256
             |    ) AS lv
             |  FROM px),
             |hsh AS (
             |  SELECT doc_id, w, h,
             |    CAST(list_sum(list_transform(generate_series(1, n), i ->
             |      CASE WHEN n * lv[CAST(i AS INT)] > list_sum(lv)
             |           THEN (CAST(1 AS BIGINT) << (i - 1))
             |           ELSE 0 END)) AS BIGINT) AS ahash
             |  FROM lum)
             |SELECT min(doc_id) AS keep_id, CAST(w AS BIGINT) AS w,
             |  CAST(h AS BIGINT) AS h, ahash,
             |  CAST(count(*) AS BIGINT) AS n_imgs
             |FROM hsh GROUP BY w, h, ahash
             |ORDER BY keep_id""".stripMargin)),

    // ---- q127: incremental (delta-vs-corpus) exact dedup — the
    // daily-ingest operator: classify each NEW document as 'dup_base'
    // (content already in the corpus), 'dup_delta' (first seen inside
    // this same batch wins), or 'new'. 100 TB shape: the small DELTA
    // fingerprint set is broadcast against ONE base scan (the corpus
    // is never shuffled, never re-paired against itself — that's the
    // whole point vs re-running q20 on base+delta); the surviving hit
    // set is tiny. Broadcast is stats-gated with a shuffle-join
    // fallback ----
    Q("q127_delta_dedup",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val fp = T(s, d, "documents")
          .select($"doc_id", TextFunctions.fingerprint($"text").as("fp"))
        val delta = fp.where($"doc_id" % 10 === 0)
        val base = fp.where($"doc_id" % 10 =!= 0)
        val deltaFps = delta.select($"fp").distinct()
        val est = deltaFps.queryExecution.optimizedPlan.stats.sizeInBytes
        val hinted = if (est <= (64L << 20)) broadcast(deltaFps)
                     else deltaFps
        val inBase = base.join(hinted, "fp")
          .select($"fp").distinct().withColumn("hit", lit(true))
        delta
          .withColumn("rk", row_number().over(Window
            .partitionBy($"fp").orderBy($"doc_id")))
          .join(inBase, Seq("fp"), "left")
          .select($"doc_id",
            when($"hit", "dup_base")
              .when($"rk" > 1, "dup_delta")
              .otherwise("new").as("status"))
          .orderBy($"doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    AS fp
             |  FROM documents),
             |delta AS (SELECT * FROM fp WHERE doc_id % 10 = 0),
             |base AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 != 0),
             |r AS (SELECT doc_id, fp, row_number() OVER (
             |        PARTITION BY fp ORDER BY doc_id) AS rk
             |      FROM delta)
             |SELECT r.doc_id,
             |  CASE WHEN b.fp IS NOT NULL THEN 'dup_base'
             |       WHEN r.rk > 1 THEN 'dup_delta'
             |       ELSE 'new' END AS status
             |FROM r LEFT JOIN base b ON r.fp = b.fp
             |ORDER BY r.doc_id""".stripMargin)),

    // ---- q128: MMR (maximal marginal relevance) diversified re-rank
    // — retrieval diversification for RAG/eval-set construction: from
    // the cosine top-20 pool, greedily pick 5 results maximizing
    // 0.7*relevance - 0.3*max-similarity-to-already-picked, so
    // near-duplicate hits don't crowd the result list. The pool
    // selection is the distributed q28 scan; the greedy itself is
    // k-bounded (20 candidates) driver math — the same budget class
    // as the q120 LUT — and the oracle unrolls the 5 identical greedy
    // steps as chained CTEs (argmax per step, ties to smallest id) ----
    Q("q128_mmr_rerank",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        val query = emb.where($"vec_id" === 0L)
          .select($"v").head().getSeq[Double](0)
        val top = Similarity.cosineTopK(
          T(s, d, "embeddings"), "embedding", "vec_id", query, 20)
        val cand = top.join(emb, "vec_id")
          .select($"vec_id", $"score", $"v")
          .orderBy($"vec_id")
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1),
            r.getSeq[Double](2).toArray))
          .toSeq
        val sel = Similarity.mmrSelect(cand, 5, 0.7, 0.3)
        s.createDataFrame(sel).toDF("rank", "vec_id", "mmr")
          .orderBy($"rank")
      },
      Some("""WITH e AS (SELECT vec_id,
             |            CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
             |sc AS (SELECT e.vec_id,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM e, q),
             |cand AS (SELECT vec_id,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS rel
             |  FROM sc ORDER BY rel DESC, vec_id LIMIT 20),
             |cv AS (SELECT c.vec_id, c.rel, e.v
             |       FROM cand c JOIN e USING (vec_id)),
             |ps AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
             |  round(CASE WHEN sqrt(list_sum(list_transform(a.v,
             |          x -> x * x))) = 0
             |        OR sqrt(list_sum(list_transform(b.v,
             |          x -> x * x))) = 0 THEN 0
             |    ELSE list_sum(list_transform(generate_series(1, 64),
             |          i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]))
             |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
             |       * sqrt(list_sum(list_transform(b.v, x -> x * x))))
             |    END, 6) AS sim
             |  FROM cv a, cv b WHERE a.vec_id != b.vec_id),
             |s1 AS (SELECT vec_id, round(0.7 * rel, 6) AS mmr
             |       FROM cv ORDER BY rel DESC, vec_id LIMIT 1),
             |s2 AS (SELECT c.vec_id,
             |    round(0.7 * c.rel - 0.3 * m.ms, 6) AS mmr
             |  FROM cv c JOIN (SELECT p.ai AS vec_id, max(p.sim) AS ms
             |    FROM ps p JOIN s1 ON p.bi = s1.vec_id GROUP BY p.ai) m
             |    ON c.vec_id = m.vec_id
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
             |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
             |sel2 AS (SELECT vec_id FROM s1
             |         UNION ALL SELECT vec_id FROM s2),
             |s3 AS (SELECT c.vec_id,
             |    round(0.7 * c.rel - 0.3 * m.ms, 6) AS mmr
             |  FROM cv c JOIN (SELECT p.ai AS vec_id, max(p.sim) AS ms
             |    FROM ps p JOIN sel2 ON p.bi = sel2.vec_id
             |    GROUP BY p.ai) m ON c.vec_id = m.vec_id
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
             |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
             |sel3 AS (SELECT vec_id FROM sel2
             |         UNION ALL SELECT vec_id FROM s3),
             |s4 AS (SELECT c.vec_id,
             |    round(0.7 * c.rel - 0.3 * m.ms, 6) AS mmr
             |  FROM cv c JOIN (SELECT p.ai AS vec_id, max(p.sim) AS ms
             |    FROM ps p JOIN sel3 ON p.bi = sel3.vec_id
             |    GROUP BY p.ai) m ON c.vec_id = m.vec_id
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
             |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
             |sel4 AS (SELECT vec_id FROM sel3
             |         UNION ALL SELECT vec_id FROM s4),
             |s5 AS (SELECT c.vec_id,
             |    round(0.7 * c.rel - 0.3 * m.ms, 6) AS mmr
             |  FROM cv c JOIN (SELECT p.ai AS vec_id, max(p.sim) AS ms
             |    FROM ps p JOIN sel4 ON p.bi = sel4.vec_id
             |    GROUP BY p.ai) m ON c.vec_id = m.vec_id
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
             |  ORDER BY mmr DESC, c.vec_id LIMIT 1)
             |SELECT CAST(1 AS BIGINT) AS rank, vec_id, mmr FROM s1
             |UNION ALL SELECT 2, vec_id, mmr FROM s2
             |UNION ALL SELECT 3, vec_id, mmr FROM s3
             |UNION ALL SELECT 4, vec_id, mmr FROM s4
             |UNION ALL SELECT 5, vec_id, mmr FROM s5
             |ORDER BY rank""".stripMargin)),

    // ---- q129: per-source boilerplate n-gram report — the top-10
    // most document-frequent trigrams per source (df over DISTINCT
    // (doc, gram)), the signal a C4-style cleaner uses to find
    // site-template text. Rank-based (not a fixed df-ratio threshold,
    // which goes empty as docs-per-source grows with SF); ties break
    // on the gram string. One distinct-project + one (source, gram)
    // agg + a 10-row-per-source window ----
    Q("q129_boilerplate_grams",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        val dg = docs.select($"source", $"doc_id",
          explode(array_distinct(call_function("ngram_join",
            TextFunctions.tokens($"text"), lit(3)))).as("gram"))
        val nd = docs.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"))
        dg.groupBy($"source", $"gram")
          .agg(count(lit(1)).as("df"))
          .withColumn("rank", row_number().over(Window
            .partitionBy($"source")
            .orderBy($"df".desc, $"gram".asc)).cast("long"))
          .where($"rank" <= 10)
          .join(nd, "source")
          .select($"source", $"rank", $"gram", $"df",
            round($"df".cast("double") / $"n_docs", 6).as("df_ratio"))
          .orderBy($"source", $"rank")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $dTokens AS t
              |             FROM documents),
              |dg AS (SELECT DISTINCT source, doc_id, gram FROM (
              |  SELECT source, doc_id, unnest(list_transform(
              |    generate_series(1, len(t) - 2),
              |    i -> t[CAST(i AS INT)] || ' ' ||
              |         t[CAST(i AS INT) + 1] || ' ' ||
              |         t[CAST(i AS INT) + 2])) AS gram
              |  FROM toks WHERE len(t) >= 3)),
              |nd AS (SELECT source, count(*) AS n_docs
              |       FROM documents GROUP BY source),
              |df AS (SELECT source, gram, count(*) AS df
              |       FROM dg GROUP BY source, gram),
              |rk AS (SELECT source, gram, df,
              |  CAST(row_number() OVER (PARTITION BY source
              |    ORDER BY df DESC, gram ASC) AS BIGINT) AS rank
              |  FROM df)
              |SELECT rk.source, rk.rank, rk.gram,
              |  CAST(rk.df AS BIGINT) AS df,
              |  round(CAST(rk.df AS DOUBLE) / nd.n_docs, 6) AS df_ratio
              |FROM rk JOIN nd USING (source)
              |WHERE rk.rank <= 10
              |ORDER BY rk.source, rk.rank""".stripMargin)),

    // ---- q130: STREAMING HLL distinct-content estimation per source
    // — mergeable-sketch state in the streaming state store (see
    // [[graft.streaming.StreamingSketch]]), replayed over the same
    // 4-batch file feed as q104/q105. The final per-source emission
    // (selected by max n_seen — strictly increasing per emission) is
    // gated q112-style: `seen_all` proves the stream consumed every
    // row, `est_ok` gates the sketch estimate into ±5% of the exact
    // batch distinct count (lgK=12 RSE is ~1.6%; at these
    // cardinalities the sketch is in exact mode). The oracle is the
    // exact batch aggregation the streaming construct must agree with ----
    Q("q130_streaming_sketch",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
          .select($"doc_id", $"source", $"text")
        val feed = stageFileFeed(docs, nb = 4)
        val ckpt = graft.TempDirs.create("graft-q130-ckpt")
        val outDir = graft.TempDirs.create("graft-q130-out")
        val stream = s.readStream
          .schema("doc_id BIGINT, source STRING, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(feed)
        val sq = graft.streaming.StatePartitions.sized(s, 8) {
          graft.streaming.StreamingSketch
            .distinctBySource(stream, "text", "source")
            .writeStream.outputMode("append").format("parquet")
            .option("checkpointLocation", ckpt)
            .trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(outDir)
        }
        sq.awaitTermination()
        val ests = s.read
          .schema("source STRING, n_seen BIGINT, estimate DOUBLE")
          .parquet(outDir)
          .withColumn("rk", row_number().over(Window
            .partitionBy($"source").orderBy($"n_seen".desc)))
          .where($"rk" === 1)
        val exact = docs
          .select($"source", TextFunctions.fingerprint($"text").as("fp"))
          .groupBy($"source")
          .agg(countDistinct($"fp").as("n_exact"),
            count(lit(1)).as("n_rows"))
        ests.join(exact, "source")
          .select($"source", $"n_rows", $"n_exact",
            ($"n_seen" === $"n_rows").as("seen_all"),
            (abs($"estimate" - $"n_exact".cast("double")) <=
              $"n_exact".cast("double") * 0.05).as("est_ok"))
          .orderBy($"source")
      },
      Some("""WITH f AS (SELECT source,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
             |    AS fp FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT fp) AS BIGINT) AS n_exact,
             |  true AS seen_all, true AS est_ok
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    // ---- q131: BPE merge-candidate mining — one iteration of
    // byte-pair-encoding vocabulary induction: count every adjacent
    // character pair across all token OCCURRENCES (occurrence-
    // weighted, as the BPE training loop does) and rank the top-20
    // merge candidates. The full tokenizer training is this agg in a
    // loop with a growing symbol table; the per-iteration shape — one
    // explode + one hash-agg + global top-k — is what must scale.
    // TakeOrdered keeps the top-k driver-side cost at k, not
    // |vocab| ----
    Q("q131_bpe_merges",
      (s, d) => {
        import s.implicits._
        T(s, d, "documents")
          .select(explode(TextFunctions.tokens($"text")).as("tok"))
          .where(length($"tok") >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(tok) - 1)," +
              " i -> substring(tok, i, 2))")).as("pair"))
          .groupBy($"pair").agg(count(lit(1)).as("n_occ"))
          .orderBy($"n_occ".desc, $"pair")
          .limit(20)
      },
      Some(s"""WITH toks AS (SELECT unnest($dTokens) AS tok
              |             FROM documents),
              |p AS (SELECT unnest(list_transform(
              |    generate_series(1, length(tok) - 1),
              |    i -> substr(tok, CAST(i AS INT), 2))) AS pair
              |  FROM toks WHERE length(tok) >= 2)
              |SELECT pair, CAST(count(*) AS BIGINT) AS n_occ
              |FROM p GROUP BY pair
              |ORDER BY n_occ DESC, pair LIMIT 20""".stripMargin)),

    // ---- q132: embedding outlier detection — flag vectors whose
    // euclidean distance to their label centroid exceeds the label's
    // exact p95 (the drop-the-tail embedding-quality filter). The
    // centroid is q29's DECIMAL-exact per-dimension mean; distances
    // fold per ROW over the intact array (zip_with+aggregate,
    // ascending — never a float sum across shuffled rows), and both
    // the distances and the interpolated percentile are bit-identical
    // on both engines. Shape: one (label, pos) agg for centroids
    // (KB-sized, broadcast back), one scan for distances, one
    // 10-key percentile agg ----
    Q("q132_embedding_outliers",
      (s, d) => {
        import s.implicits._
        val ex = T(s, d, "embeddings")
          .select($"label",
            posexplode($"embedding".cast("array<double>")))
          .toDF("label", "pos", "x")
        val cent = ex.groupBy($"label", $"pos")
          .agg((sum($"x".cast("decimal(27,12)")).cast("double") /
            count(lit(1))).as("c"))
        val carr = cent.groupBy($"label")
          .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
            s0 => s0("c")).as("cv"))
        val ev = T(s, d, "embeddings")
          .select($"vec_id", $"label",
            $"embedding".cast("array<double>").as("v"))
        val dist = ev.join(broadcast(carr), "label")
          .withColumn("dist", sqrt(aggregate(
            zip_with($"v", $"cv", (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, y) => acc + y)))
        val p95 = dist.groupBy($"label")
          .agg(percentile($"dist", lit(0.95)).as("p95"))
        dist.join(broadcast(p95), "label")
          .where($"dist" > $"p95")
          .select($"vec_id", $"label", round($"dist", 6).as("dist_v"),
            round($"p95", 6).as("p95_v"))
          .orderBy($"vec_id")
      },
      Some("""WITH ex AS (SELECT label, unnest(embedding) AS x,
             |    generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |m AS (SELECT label, pos,
             |    CAST(sum(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
             |      / count(*) AS c
             |  FROM ex GROUP BY label, pos),
             |carr AS (SELECT label, list(c ORDER BY pos) AS cv
             |         FROM m GROUP BY label),
             |e AS (SELECT vec_id, label,
             |        CAST(embedding AS DOUBLE[]) AS v
             |      FROM embeddings),
             |dist AS (SELECT e.vec_id, e.label,
             |  sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> (v[CAST(i AS INT)] - cv[CAST(i AS INT)])
             |       * (v[CAST(i AS INT)] - cv[CAST(i AS INT)]))))
             |    AS dist
             |  FROM e JOIN carr USING (label)),
             |p AS (SELECT label, quantile_cont(dist, 0.95) AS p95
             |      FROM dist GROUP BY label)
             |SELECT d.vec_id, d.label, round(d.dist, 6) AS dist_v,
             |  round(p.p95, 6) AS p95_v
             |FROM dist d JOIN p USING (label)
             |WHERE d.dist > p.p95
             |ORDER BY d.vec_id""".stripMargin)),

    // ---- q133: per-source distribution drift — total-variation
    // distance between each source's unigram distribution and the
    // corpus distribution: TV_s = sum_i |c_si*N - C_i*N_s| /
    // (2*N_s*N). The numerators are EXACT BIGINT products summed
    // exactly (no float probability is ever added across rows — the
    // one double division happens once per source at the end), which
    // sidesteps both float-sum ordering and libm (no log, unlike KL).
    // This is the mixture-drift monitor a pipeline runs per shard.
    // Shape: token agg -> (source x vocab) grid from two SMALL aggs
    // (vocab-sized broadcast), one BIGINT sum per source ----
    Q("q133_source_drift",
      (s, d) => {
        import s.implicits._
        val tok = T(s, d, "documents")
          .select($"source", explode(TextFunctions.tokens($"text"))
            .as("tok"))
        val cs = tok.groupBy($"source", $"tok")
          .agg(count(lit(1)).as("c_si"))
        val ns = tok.groupBy($"source").agg(count(lit(1)).as("n_s"))
        val ci = tok.groupBy($"tok").agg(count(lit(1)).as("c_i"))
        val tot = tok.agg(count(lit(1)).as("n_tot"))
        ns.crossJoin(broadcast(ci))
          .join(cs, Seq("source", "tok"), "left")
          .withColumn("c_si", coalesce($"c_si", lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("numer",
            abs($"c_si" * $"n_tot" - $"c_i" * $"n_s"))
          .groupBy($"source", $"n_s", $"n_tot")
          .agg(sum($"numer").as("num"))
          .select($"source", $"n_s",
            round($"num".cast("double") /
              (lit(2.0) * $"n_s" * $"n_tot"), 6).as("tv_dist"))
          .orderBy($"source")
      },
      Some(s"""WITH tok AS (SELECT source, unnest($dTokens) AS tok
              |            FROM documents),
              |cs AS (SELECT source, tok, count(*) AS c_si
              |       FROM tok GROUP BY source, tok),
              |ns AS (SELECT source, count(*) AS n_s
              |       FROM tok GROUP BY source),
              |ci AS (SELECT tok, count(*) AS c_i FROM tok GROUP BY tok),
              |tot AS (SELECT count(*) AS n_tot FROM tok),
              |grid AS (SELECT ns.source, ns.n_s, ci.tok, ci.c_i
              |         FROM ns, ci),
              |j AS (SELECT g.source, g.n_s, g.c_i, t.n_tot,
              |        coalesce(cs.c_si, 0) AS c_si
              |      FROM grid g
              |      LEFT JOIN cs ON cs.source = g.source
              |                  AND cs.tok = g.tok, tot t),
              |agg AS (SELECT source, n_s, n_tot,
              |  sum(abs(c_si * n_tot - c_i * n_s)) AS num
              |  FROM j GROUP BY source, n_s, n_tot)
              |SELECT source, CAST(n_s AS BIGINT) AS n_s,
              |  round(CAST(num AS DOUBLE) / (2.0 * n_s * n_tot), 6)
              |    AS tv_dist
              |FROM agg ORDER BY source""".stripMargin)),

    // ---- q135: REAL video decode — the last media family goes
    // data-plane: each row's text becomes a (2 + id%3)-frame animated
    // GIF89a (lossless indexed encode, <= 48 colors/frame), staged to
    // parquet, then decoded through javax.imageio's frame-sequence
    // reader into exact per-frame channel sums. The oracle recomputes
    // every frame's sums from the SOURCE TEXT without touching GIF
    // bytes, so the gate proves the real multi-frame codec round trip
    // (same construction as q107 images / q116 audio). Scale shape:
    // encode and decode are mapPartitions over columnar binaries, one
    // codec context per partition ----
    Q("q135_video_decode",
      (s, d) => {
        import s.implicits._
        val gifs = Multimodal.videosFromText(
          T(s, d, "documents"), "text", "doc_id")
        val dir = graft.TempDirs.create("graft-q135-gif")
        gifs.write.mode("overwrite").parquet(dir)
        Multimodal.videoFrameStats(
          s.read.schema("asset_id BIGINT, gif BINARY").parquet(dir), "gif",
            "asset_id")
          .select($"asset_id", $"frame".cast("long").as("frame"),
            $"w".cast("long").as("w"), $"h".cast("long").as("h"),
            $"sum_r", $"sum_g", $"sum_b")
          .orderBy($"asset_id", $"frame")
      },
      Some("""WITH px AS (
             |  SELECT doc_id, text, length(text) AS len,
             |         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             |         2 + doc_id % 3 AS nf
             |  FROM documents WHERE length(text) > 0),
             |fr AS (
             |  SELECT doc_id, text, len, w, h,
             |         unnest(generate_series(0, nf - 1)) AS f
             |  FROM px),
             |sums AS (
             |  SELECT doc_id, f, w, h,
             |    list_sum(list_transform(generate_series(0, w*h - 1),
             |      i -> unicode(text[CAST((3*i + 0 + 7*f) % len AS INT) + 1
             |                     : CAST((3*i + 0 + 7*f) % len AS INT) + 1])
             |           % 256)) AS sum_r,
             |    list_sum(list_transform(generate_series(0, w*h - 1),
             |      i -> unicode(text[CAST((3*i + 1 + 7*f) % len AS INT) + 1
             |                     : CAST((3*i + 1 + 7*f) % len AS INT) + 1])
             |           % 256)) AS sum_g,
             |    list_sum(list_transform(generate_series(0, w*h - 1),
             |      i -> unicode(text[CAST((3*i + 2 + 7*f) % len AS INT) + 1
             |                     : CAST((3*i + 2 + 7*f) % len AS INT) + 1])
             |           % 256)) AS sum_b
             |  FROM fr)
             |SELECT doc_id AS asset_id, CAST(f AS BIGINT) AS frame,
             |  CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
             |  CAST(sum_r AS BIGINT) AS sum_r,
             |  CAST(sum_g AS BIGINT) AS sum_g,
             |  CAST(sum_b AS BIGINT) AS sum_b
             |FROM sums ORDER BY asset_id, frame""".stripMargin)),

    // ---- q137: cluster-balanced coreset sampling — the diversity-
    // preserving downselect (SemDeDup/DEDUP-then-balance shape): every
    // vector joins its nearest IVF centroid (map-side codegen'd
    // ivf_assign argmax over a literal centroid matrix — no shuffle of
    // the corpus side), then each cluster contributes at most 25
    // members chosen by salted-hash rank (q118's deterministic
    // reservoir), so dense regions stop dominating the sample. One
    // projection + one per-cluster window; at 100 TB the quota rank
    // runs per cluster partition, never globally ----
    Q("q137_coreset_sample",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val emb = T(s, d, "embeddings")
        val cents = Similarity.ivfCentroids(emb, "embedding", "vec_id",
          every = 37)
        val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id",
          cents)
        assigned.select($"vec_id", $"centroid")
          .withColumn("rn", row_number().over(Window
            .partitionBy($"centroid")
            .orderBy(md5(concat(lit("graft"),
              $"vec_id".cast("string"))), $"vec_id")).cast("long"))
          .where($"rn" <= 25)
          .select($"centroid".cast("long").as("cluster"), $"rn",
            $"vec_id")
          .orderBy($"cluster", $"rn")
      },
      Some("""WITH cents AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id % 37 = 0 AND vec_id < 5000),
             |pairs AS (
             |  SELECT e.vec_id, c.cidx,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      c.cv[CAST(j AS INT)]
             |      * CAST(e.embedding[CAST(j AS INT)] AS DOUBLE))) AS dt,
             |    sqrt(list_sum(list_transform(c.cv, x -> x * x))) AS nc,
             |    sqrt(list_sum(list_transform(e.embedding, x ->
             |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne
             |  FROM embeddings e, cents c),
             |assign AS (
             |  SELECT vec_id, cidx,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY
             |      (CASE WHEN nc = 0 OR ne = 0 THEN 0
             |            ELSE dt / (nc * ne) END) DESC, cidx ASC) AS rk
             |  FROM pairs),
             |a1 AS (SELECT vec_id, cidx FROM assign WHERE rk = 1),
             |r AS (SELECT cidx, vec_id,
             |  CAST(row_number() OVER (PARTITION BY cidx
             |    ORDER BY md5('graft' || CAST(vec_id AS VARCHAR)),
             |             vec_id) AS BIGINT) AS rn
             |  FROM a1)
             |SELECT CAST(cidx AS BIGINT) AS cluster, rn, vec_id
             |FROM r WHERE rn <= 25
             |ORDER BY cluster, rn""".stripMargin)),

    // ---- q139: deterministic weighted resampling (systematic
    // sampling) — the epoch-mixing step that up/down-samples sources
    // by weight (here w = 1 + srcnum%3) WITHOUT randomness or libm:
    // lay the integer weights end-to-end (Curate.tokenStarts — the
    // scalable two-phase prefix scan, not a one-partition global
    // window), drop N evenly spaced picks onto the cumulative line,
    // and a doc's multiplicity is the exact integer count of picks in
    // its interval: min(N, ceil((start+w)*N/W)) - min(N,
    // ceil(start*N/W)). Exactly N rows are emitted in total,
    // Σw-proportional per doc, reproducible at any partitioning.
    // (start*N fits BIGINT through sf100; DECIMAL beyond) ----
    Q("q139_weighted_resample",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val wt = (lit(1) +
          substring($"source", 4, 10).cast("int") % 3).cast("long")
        val st = Curate.tokenStarts(
          docs.select($"doc_id", $"source"), "doc_id", wt)
        val tot = st.agg(count(lit(1)).as("n"), sum($"tok").as("tw"))
        st.crossJoin(broadcast(tot))
          .withColumn("n_picks", expr(
            "least(n, ((start + tok) * n + tw - 1) div tw)" +
              " - least(n, (start * n + tw - 1) div tw)"))
          .where($"n_picks" > 0)
          .join(docs.select($"doc_id", $"source"), "doc_id")
          .select($"doc_id", $"source", $"tok".as("wt"), $"n_picks")
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, source,
             |  1 + CAST(substr(source, 4, 10) AS INT) % 3 AS wt
             |  FROM documents),
             |c AS (SELECT doc_id, source, wt,
             |  coalesce(sum(wt) OVER (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |    0) AS start
             |  FROM w),
             |t AS (SELECT count(*) AS n, sum(wt) AS tw FROM w),
             |p AS (SELECT c.doc_id, c.source, c.wt,
             |  least(t.n, ((c.start + c.wt) * t.n + t.tw - 1) // t.tw)
             |  - least(t.n, (c.start * t.n + t.tw - 1) // t.tw)
             |    AS n_picks
             |  FROM c, t)
             |SELECT doc_id, source, CAST(wt AS BIGINT) AS wt,
             |  CAST(n_picks AS BIGINT) AS n_picks
             |FROM p WHERE n_picks > 0 ORDER BY doc_id"""
        .stripMargin)),

    // ---- q140: feature hashing (the hashing trick) — the stateless
    // featurizer that turns text into a fixed-width sparse count
    // vector with NO vocabulary to build, broadcast, or version:
    // dim(t) = md5_32(t) mod 64. Emits the sparse (doc, dim, count)
    // relation plus the exact-integer L2 norm. One explode + one
    // hash-agg; at 100 TB the vocabulary table a CountVectorizer
    // would need simply doesn't exist — that absence IS the operator ----
    Q("q140_feature_hashing",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val f = T(s, d, "documents")
          .select($"doc_id",
            explode(TextFunctions.tokens($"text")).as("t"))
          .withColumn("dim",
            (TextFunctions.tokenHash32($"t") % 64).cast("long"))
          .groupBy($"doc_id", $"dim").agg(count(lit(1)).as("cnt"))
        f.withColumn("l2", round(sqrt(
            sum($"cnt" * $"cnt").over(Window.partitionBy($"doc_id"))
              .cast("double")), 6))
          .orderBy($"doc_id", $"dim")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest($dTokens) AS t
              |            FROM documents),
              |f AS (SELECT doc_id,
              |  CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
              |    % 64 AS dim,
              |  count(*) AS cnt
              |  FROM tok GROUP BY 1, 2),
              |n AS (SELECT doc_id,
              |  round(sqrt(CAST(sum(cnt*cnt) AS DOUBLE)), 6) AS l2
              |  FROM f GROUP BY doc_id)
              |SELECT f.doc_id, CAST(f.dim AS BIGINT) AS dim,
              |  CAST(f.cnt AS BIGINT) AS cnt, n.l2
              |FROM f JOIN n USING (doc_id)
              |ORDER BY f.doc_id, f.dim""".stripMargin)),

    // ---- q141: LSH band-configuration tuning report — before
    // committing an expensive dedup pass, measure each (bands x rows)
    // split of the 16-entry signature: collision buckets, candidate
    // pairs, worst bucket. Pair counts come from BUCKET SIZES
    // (sum m*(m-1)/2), never materialized pairs, so the report is
    // safe to run on any corpus — including ones whose 2x8 config
    // would explode an actual pair join. Three cheap aggs over one
    // signature projection ----
    Q("q141_lsh_tuning",
      (s, d) => {
        import s.implicits._
        val sigs = T(s, d, "documents")
          .select($"doc_id",
            TextFunctions.minhashSignature($"text", 16).as("sig"))
          .where($"sig".isNotNull)
        val per = Seq((2, 8), (4, 4), (8, 2)).map { case (b, r) =>
          sigs.select($"doc_id",
              posexplode(TextFunctions.lshBands($"sig", b, r)))
            .groupBy($"pos", $"col").agg(count(lit(1)).as("m"))
            .where($"m" >= 2)
            .agg(count(lit(1)).as("n_buckets"),
              coalesce(sum(expr("(m * (m - 1)) div 2")), lit(0L))
                .as("n_pairs"),
              coalesce(max($"m"), lit(0L)).as("max_bucket"))
            .select(lit(s"${b}x$r").as("config"), $"n_buckets",
              $"n_pairs", $"max_bucket")
        }
        per.reduce(_ unionAll _).orderBy($"config")
      },
      Some {
        val cfg = Seq((2, 8), (4, 4), (8, 2)).map { case (b, r) =>
          s"""SELECT '${b}x$r' AS config,
             |  CAST(count(*) AS BIGINT) AS n_buckets,
             |  coalesce(CAST(sum((m * (m - 1)) // 2) AS BIGINT), 0)
             |    AS n_pairs,
             |  coalesce(CAST(max(m) AS BIGINT), 0) AS max_bucket
             |FROM (
             |  SELECT band, bkey, count(*) AS m FROM (
             |    SELECT s.doc_id, bb.band,
             |      md5(array_to_string(list_transform(
             |        sig[CAST(bb.band * $r + 1 AS INT)
             |            : CAST(bb.band * $r + $r AS INT)],
             |        x -> CAST(x AS VARCHAR)), '|')) AS bkey
             |    FROM s, (SELECT unnest(generate_series(0, ${b - 1}))
             |             AS band) bb)
             |  GROUP BY band, bkey HAVING count(*) >= 2)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH h0 AS (SELECT doc_id, $dHashes AS h FROM documents),
           |s AS (SELECT doc_id, $dSig AS sig
           |      FROM h0 WHERE len(h) > 0)
           |$cfg
           |ORDER BY config""".stripMargin
      }),

    // ---- q142: chunk-reassembly ROUND-TRIP gate — the inverse
    // operator of q75's overlapped chunking, and the audit a RAG
    // pipeline runs to prove its chunk store is lossless: re-derive
    // each document from its (64-token window, 48 stride) chunks by
    // keeping chunk 0 whole and dropping every later chunk's 16-token
    // overlap, then hash-compare against the original token stream.
    // (The chunking formula guarantees the last chunk is > 16 tokens,
    // so every chunk contributes.) Same gate family as the q38/q52
    // format round trips, applied to a curation operator ----
    Q("q142_chunk_roundtrip",
      (s, d) => {
        import s.implicits._
        val (win, stride) = (64, 48)
        val ov = win - stride
        val base = T(s, d, "documents")
          .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
          .withColumn("n", size($"toks")).where($"n" > 0)
        val parts = base
          .withColumn("nchunks",
            when($"n" <= win, lit(1L)).otherwise(
              floor(($"n" - win + stride - 1) / lit(stride))
                .cast("long") + 1L))
          .withColumn("chunk_id",
            explode(sequence(lit(0L), $"nchunks" - 1)))
          .select($"doc_id", $"chunk_id",
            slice($"toks", ($"chunk_id" * stride + 1).cast("int"),
              lit(win)).as("ctoks"))
          .select($"doc_id", $"chunk_id",
            when($"chunk_id" === 0, $"ctoks")
              .otherwise(expr(
                s"slice(ctoks, ${ov + 1}, size(ctoks) - $ov)"))
              .as("part"))
        val rejoined = parts.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            md5(concat_ws(" ", flatten(transform(
              array_sort(collect_list(struct($"chunk_id", $"part"))),
              x => x("part"))))).as("rejoin_md5"))
        base.select($"doc_id",
            md5(concat_ws(" ", $"toks")).as("orig_md5"))
          .join(rejoined, "doc_id")
          .select($"doc_id", $"n_chunks", $"orig_md5", $"rejoin_md5",
            ($"orig_md5" === $"rejoin_md5").as("ok"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, $dTokens AS t
              |           FROM documents),
              |n AS (SELECT doc_id, t, len(t) AS n FROM tk
              |      WHERE len(t) > 0),
              |c AS (SELECT doc_id, t, n,
              |  CASE WHEN n <= 64 THEN 1
              |       ELSE (n - 64 + 47) // 48 + 1 END AS nchunks
              |  FROM n),
              |e AS (SELECT doc_id, t, n,
              |  CAST(unnest(generate_series(0, nchunks - 1)) AS BIGINT)
              |    AS chunk_id
              |  FROM c),
              |ch AS (SELECT doc_id, chunk_id,
              |  t[CAST(chunk_id * 48 + 1 AS INT)
              |    : CAST(least(chunk_id * 48 + 64, n) AS INT)]
              |    AS ctoks
              |  FROM e),
              |p AS (SELECT doc_id, chunk_id,
              |  CASE WHEN chunk_id = 0 THEN ctoks
              |       ELSE ctoks[17:len(ctoks)] END AS part
              |  FROM ch),
              |r AS (SELECT doc_id,
              |  CAST(count(*) AS BIGINT) AS n_chunks,
              |  md5(array_to_string(flatten(
              |    list(part ORDER BY chunk_id)), ' ')) AS rejoin_md5
              |  FROM p GROUP BY doc_id)
              |SELECT n.doc_id, r.n_chunks,
              |  md5(array_to_string(n.t, ' ')) AS orig_md5,
              |  r.rejoin_md5,
              |  md5(array_to_string(n.t, ' ')) = r.rejoin_md5 AS ok
              |FROM n JOIN r USING (doc_id)
              |ORDER BY n.doc_id""".stripMargin)),

    // ---- q144: Z-order layout bucketing — the multi-dimension
    // clustering step behind skip-index pruning (Delta/Iceberg
    // OPTIMIZE ZORDER): interleave the bits of two column values
    // (n_chars, token count) into one sort key, rank the corpus on it
    // with the SCALABLE two-phase prefix scan (tokenStarts with
    // weight 1 — a global ntile window would run on one partition),
    // cut 32 equal buckets, and report each bucket's min/max
    // envelope on BOTH dimensions — the stats a reader prunes on.
    // All integer arithmetic; ranks tie-break on doc_id via a
    // composite key (doc_id fits 20 bits through sf100) ----
    Q("q144_zorder_layout",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
          .select($"doc_id",
            ($"n_chars" % 65536).cast("long").as("x"),
            (size(TextFunctions.tokens($"text")) % 65536).cast("long")
              .as("y"))
        // eager checkpoint: keyed feeds BOTH the rank scan and the
        // join-back — without it the tokenize (the dominant linear
        // cost) runs twice (tokenStarts checkpoints only its own
        // narrow (id, tok) projection)
        val keyed = docs.withColumn("zkey", expr(
            "aggregate(sequence(0, 15), 0L, (acc, j) -> acc" +
              " + shiftleft(shiftright(x, j) & 1, 2 * j)" +
              " + shiftleft(shiftright(y, j) & 1, 2 * j + 1))"))
          .withColumn("zu",
            shiftleft($"zkey", 20) + $"doc_id")
          .localCheckpoint(true)
        val ranked = Curate.tokenStarts(keyed, "zu", lit(1L))
          .join(keyed, "zu")
        // corpus row count from a pruned base scan: counting `ranked`
        // would re-run the tokenize + prefix-scan + join pipeline a
        // second time just to learn N (measured 2x the query at sf1)
        val tot = T(s, d, "documents").agg(count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("bucket", expr("(start * 32) div n"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
            min($"x").as("min_chars"), max($"x").as("max_chars"),
            min($"y").as("min_toks"), max($"y").as("max_toks"))
          .orderBy($"bucket")
      },
      Some(s"""WITH dxy AS (SELECT doc_id,
              |  CAST(n_chars % 65536 AS BIGINT) AS x,
              |  CAST(len($dTokens) % 65536 AS BIGINT) AS y
              |  FROM documents),
              |z AS (SELECT doc_id, x, y,
              |  CAST(list_sum(list_transform(generate_series(0, 15),
              |    j -> (((x >> CAST(j AS INT)) & 1)
              |            << CAST(2*j AS INT))
              |       + (((y >> CAST(j AS INT)) & 1)
              |            << CAST(2*j + 1 AS INT)))) AS BIGINT)
              |    AS zkey
              |  FROM dxy),
              |r AS (SELECT x, y,
              |  row_number() OVER (ORDER BY zkey, doc_id) - 1 AS rk
              |  FROM z),
              |t AS (SELECT count(*) AS n FROM r)
              |SELECT CAST((r.rk * 32) // t.n AS BIGINT) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  min(x) AS min_chars, max(x) AS max_chars,
              |  min(y) AS min_toks, max(y) AS max_toks
              |FROM r, t GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- q150: PMI collocation mining — which adjacent token pairs
    // co-occur far above chance (pmi = ln(p(ab)/(p(a)p(b)))), the
    // phrase-discovery signal tokenizer and n-gram LM pipelines rank
    // merge candidates by (complements q131's raw-frequency BPE pass
    // with an association-strength ranking). Three hash-aggs (bigram,
    // unigram, totals) + two broadcastable joins on the unigram dim;
    // the ln() runs once per surviving bigram. No top-k cutoff — the
    // full n_ab >= 5 table ordered by the pair key, so no float
    // ordering ever decides membership. Both engines evaluate the
    // identical left-associated double expression, so the 6-dp
    // rounding agrees ----
    Q("q150_pmi_collocations",
      (s, d) => {
        import s.implicits._
        val toks = T(s, d, "documents")
          .select(TextFunctions.tokens($"text").as("t"))
        val uni = toks.select(explode($"t").as("w"))
          .groupBy($"w").agg(count(lit(1)).as("n_w"))
        // bigram stream through the codegen'd ngram_join kernel (the
        // q110/q111 lesson: an interpreted transform lambda costs 10x);
        // the pair key splits AFTER the agg, once per surviving bigram
        val bi = toks
          .select(explode(call_function("ngram_join", $"t", lit(2)))
            .as("g"))
          .groupBy($"g").agg(count(lit(1)).as("n_ab"))
          .select(substring_index($"g", " ", 1).as("a"),
            substring_index($"g", " ", -1).as("b"), $"n_ab")
        val tot = uni.agg(sum($"n_w").cast("double").as("nu"))
          .crossJoin(bi.agg(sum($"n_ab").cast("double").as("nb")))
        bi.where($"n_ab" >= 5)
          .join(uni.select($"w".as("a"), $"n_w".as("n_a")), "a")
          .join(uni.select($"w".as("b"), $"n_w".as("n_b")), "b")
          .crossJoin(broadcast(tot))
          .select($"a", $"b", $"n_ab",
            round(log($"n_ab".cast("double") * $"nu" * $"nu" /
              ($"nb" * $"n_a" * $"n_b")), 6).as("pmi"))
          .orderBy($"a", $"b")
      },
      Some(s"""WITH t AS (SELECT $dTokens AS t FROM documents),
              |un AS (SELECT unnest(t) AS w FROM t),
              |uni AS (SELECT w, count(*) AS n_w FROM un GROUP BY w),
              |be AS (SELECT t, unnest(generate_series(1, len(t) - 1))
              |         AS i FROM t WHERE len(t) >= 2),
              |bi AS (SELECT t[CAST(i AS INT)] AS a,
              |              t[CAST(i AS INT) + 1] AS b FROM be),
              |bn AS (SELECT a, b, count(*) AS n_ab FROM bi
              |       GROUP BY a, b),
              |tot AS (SELECT
              |  (SELECT CAST(sum(n_w) AS DOUBLE) FROM uni) AS nu,
              |  (SELECT CAST(sum(n_ab) AS DOUBLE) FROM bn) AS nb)
              |SELECT bn.a, bn.b, CAST(bn.n_ab AS BIGINT) AS n_ab,
              |  round(ln(CAST(bn.n_ab AS DOUBLE) * tot.nu * tot.nu /
              |    (tot.nb * ua.n_w * ub.n_w)), 6) AS pmi
              |FROM bn JOIN uni ua ON ua.w = bn.a
              |        JOIN uni ub ON ub.w = bn.b, tot
              |WHERE bn.n_ab >= 5
              |ORDER BY bn.a, bn.b""".stripMargin)),

    // ---- q151: triangle participation in the kNN similarity graph —
    // how clustered each anchor's neighbourhood is (the clustering-
    // coefficient numerator; dense triangle counts flag redundant
    // near-duplicate cliques that survived pairwise dedup). Reuses
    // the EXACT q92/q119 graph (Similarity.knnEdges, bounded probe
    // batch, so the edge set is constant-size at any SF), symmetrizes
    // to undirected support, and counts each a<b<c triangle once via
    // the standard two-join enumeration. Per-node counts, every node
    // of the edge set reported (zero-triangle nodes included via
    // left join) ----
    Q("q151_knn_triangles",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        val und = Similarity.stagedKnnEdges(emb, 3, d)
          .select(least($"src", $"dst").as("a"),
            greatest($"src", $"dst").as("b")).distinct()
        val tri = und.as("e1")
          .join(und.as("e2"), col("e2.a") === col("e1.b"))
          .join(und.as("e3"), col("e3.a") === col("e1.a") &&
            col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"),
            col("e2.b").as("z"))
        val nodes = und.select($"a".as("node"))
          .union(und.select($"b".as("node"))).distinct()
        val perNode = tri
          .select(explode(array($"x", $"y", $"z")).as("node"))
          .groupBy($"node").agg(count(lit(1)).as("n_tri"))
        nodes.join(perNode, Seq("node"), "left")
          .select($"node", coalesce($"n_tri", lit(0L)).as("n_tri"))
          .orderBy($"node")
      },
      Some("""WITH e AS (SELECT vec_id,
             |            CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |q AS (SELECT vec_id AS src, v AS qv FROM e
             |      WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |sc AS (SELECT q.src, e.vec_id AS dst,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM e, q WHERE e.vec_id != q.src),
             |scored AS (SELECT src, dst,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |  FROM sc),
             |knn AS (SELECT src, dst FROM (
             |  SELECT src, dst, row_number() OVER (PARTITION BY src
             |    ORDER BY score DESC, dst ASC) AS rank
             |  FROM scored) WHERE rank <= 3),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |                        greatest(src, dst) AS b
             |        FROM knn),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM und e1 JOIN und e2 ON e2.a = e1.b
             |              JOIN und e3 ON e3.a = e1.a
             |                         AND e3.b = e2.b),
             |nodes AS (SELECT a AS node FROM und
             |          UNION SELECT b FROM und),
             |pn AS (SELECT node, count(*) AS n_tri FROM (
             |  SELECT x AS node FROM tri
             |  UNION ALL SELECT y FROM tri
             |  UNION ALL SELECT z FROM tri) GROUP BY node)
             |SELECT n.node,
             |  CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_tri
             |FROM nodes n LEFT JOIN pn ON pn.node = n.node
             |ORDER BY n.node""".stripMargin)),

    // ---- q152: ROC AUC of the quality score as an English-document
    // classifier — the eval step every learned quality filter needs
    // before it gates a corpus. Mann-Whitney formulation with exact
    // tie handling: 2U = sum over distinct score values of
    // np*(2*cum_nn_below + nn) (each tied pos/neg pair contributes 1
    // to 2U), AUC = 2U / (2*n_pos*n_neg). The only window runs over
    // the DISTINCT-score aggregate (bounded by the 6-dp score domain,
    // never corpus rows), so no global per-row sort exists at any
    // scale; everything is integer until the final division ----
    Q("q152_auc_quality",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sc = T(s, d, "documents").select(
          TextFunctions.qualityScore($"text").as("score"),
          when($"lang" === "en", 1L).otherwise(0L).as("pos"))
        val g = sc.groupBy($"score")
          .agg(sum($"pos").as("np"),
            (count(lit(1)) - sum($"pos")).as("nn"))
        val w = Window.orderBy($"score")
          .rowsBetween(Window.unboundedPreceding, -1)
        val u2 = g
          .withColumn("cum_nn", coalesce(sum($"nn").over(w), lit(0L)))
          .agg(sum($"np" * ($"cum_nn" * 2 + $"nn")).as("u2"),
            sum($"np").as("n_pos"), sum($"nn").as("n_neg"))
        // degenerate slice (no positives or no negatives): AUC
        // undefined -> NULL on BOTH engines (DuckDB /0 is NULL,
        // Spark double/0 is NaN — the q184/q192/q194 guard class)
        u2.select($"n_pos", $"n_neg", $"u2",
          when($"n_pos" * $"n_neg" === 0, lit(null).cast("double"))
            .otherwise(round($"u2".cast("double") /
              ($"n_pos".cast("double") * $"n_neg" * 2), 6)).as("auc"))
      },
      Some(s"""WITH f AS ($dQualityFeatures,
              |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              |  FROM documents),
              |sc AS (SELECT $dQualityExpr AS score, pos FROM f),
              |g AS (SELECT score, sum(pos) AS np,
              |        count(*) - sum(pos) AS nn
              |      FROM sc GROUP BY score),
              |c AS (SELECT score, np, nn,
              |  coalesce(sum(nn) OVER (ORDER BY score
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    0) AS cum_nn
              |  FROM g),
              |a AS (SELECT sum(np * (cum_nn * 2 + nn)) AS u2,
              |             sum(np) AS n_pos, sum(nn) AS n_neg
              |      FROM c)
              |SELECT CAST(n_pos AS BIGINT) AS n_pos,
              |  CAST(n_neg AS BIGINT) AS n_neg,
              |  CAST(u2 AS BIGINT) AS u2,
              |  round(CAST(u2 AS DOUBLE) /
              |    (CAST(n_pos AS DOUBLE) * n_neg * 2), 6) AS auc
              |FROM a""".stripMargin)),

    // ---- q153: lexical-diversity profile — token entropy, type-token
    // ratio, hapax count per document (the repetitive/templated-text
    // signals complementing q59's positional repetition detectors).
    // Per-term plogp contributions are quantized to exact 1e-6
    // BIGINTs BEFORE the per-doc sum (the q123 rule), so the grouped
    // sum is order-independent integer arithmetic and the one double
    // expression at the end is identical on both engines:
    // H = ln(n) - sum(c*ln(c))/n ----
    Q("q153_token_entropy",
      (s, d) => {
        import s.implicits._
        val tc = T(s, d, "documents")
          .select($"doc_id", explode(TextFunctions.tokens($"text"))
            .as("w"))
          .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
        tc.groupBy($"doc_id")
          .agg(sum($"c").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"),
            sum(round($"c".cast("double") * log($"c".cast("double"))
              * 1e6, 0).cast("long")).as("se"))
          .select($"doc_id", $"n_tokens", $"n_types", $"n_hapax",
            round($"n_types".cast("double") / $"n_tokens", 6)
              .as("ttr"),
            round(log($"n_tokens".cast("double")) -
              $"se".cast("double") / 1e6 / $"n_tokens", 6)
              .as("entropy"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($dTokens) AS w
              |          FROM documents),
              |tc AS (SELECT doc_id, w, count(*) AS c FROM t
              |       GROUP BY doc_id, w),
              |a AS (SELECT doc_id, sum(c) AS n_tokens,
              |  count(*) AS n_types,
              |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax,
              |  sum(CAST(round(CAST(c AS DOUBLE) *
              |    ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)) AS se
              |  FROM tc GROUP BY doc_id)
              |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              |  CAST(n_types AS BIGINT) AS n_types,
              |  CAST(n_hapax AS BIGINT) AS n_hapax,
              |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
              |  round(ln(CAST(n_tokens AS DOUBLE)) -
              |    CAST(se AS DOUBLE) / 1e6 / n_tokens, 6) AS entropy
              |FROM a ORDER BY doc_id""".stripMargin)),

    // ---- q154: containment near-dup detection — inter/|A| and
    // inter/|B| over the LSH candidate pairs. Jaccard misses the
    // quote/subset shape (a doc embedded whole inside a larger one
    // scores low union-relative); containment is the asymmetric
    // measure dedup pipelines add for it. Same bounded candidate
    // generation as q27 (cap-exact truncated buckets) and the same
    // hashed-shingle verify join; the set sizes are exact integers,
    // one rounded division per direction at the end ----
    Q("q154_containment_dedup",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        // staged candidate artifact: the banding pass its seven verify-
        // chain siblings already pay is read back, never re-run (the
        // r8 verdict's top perf item — q154 was 20.1s re-running it)
        val pairs = Dedup.stagedCandidatePairs(docs, "text", "doc_id",
          cacheKey = d)
        // widen: the shingle pass is per-doc kernel work (single-file
        // scans otherwise serialize it — ScanParallelism, r16)
        val sh = graft.ops.ScanParallelism.widen(docs).select($"doc_id",
          TextFunctions.ngramShingleHashes($"text", 3).as("sh"))
        // width-aware gate: hashed shingles materialize ~32x their
        // parquet-bytes estimate (Dedup.ShingleBytesAmplification).
        // Non-broadcastable corpora take a SHUFFLE_HASH join on the
        // corpus-linear shingle side instead of the default sort-merge:
        // SMJ would sort the candidate stream with its carried arrays
        // (the verifyCandidates spill shape, r13) — SHJ streams it
        // unsorted. Gated (Dedup.shjBuildFits): the SHJ build cannot
        // spill, so past the per-partition cap the plan falls back to
        // the spillable default rather than OOM (r13 advisor)
        val hinted: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame =
          if (Dedup.shingleBroadcastable(sh)) broadcast(_)
          else if (Dedup.shjBuildFits(sh)) _.hint("shuffle_hash")
          else identity
        pairs
          .join(hinted(sh.select($"doc_id".as("a"), $"sh".as("sha"))),
            Seq("a"))
          .join(hinted(sh.select($"doc_id".as("b"), $"sh".as("shb"))),
            Seq("b"))
          // inter via the codegen'd sorted-merge kernel: an
          // array_union formulation measured 137s vs 8s at sf0.1
          // (hash-set allocation per candidate pair)
          .select($"a", $"b", size($"sha").cast("long").as("sz_a"),
            size($"shb").cast("long").as("sz_b"),
            call_function("inter_size_sorted", $"sha", $"shb")
              .as("inter"))
          // threshold as ONE exact integer inequality: max containment
          // divides by the SMALLER set, so greatest(cont) >= 4/5 is
          // inter*5 >= least(sz)*4. The optimizer pushes this into the
          // broadcast join's condition (filtering during the probe) —
          // with a single kernel reference that costs one evaluation
          // per candidate; the r8 rounded-double form was re-evaluating
          // the kernel once per cont branch (measured 2x). Oracle
          // mirrors the same integers
          .where($"sz_a" > 0 && $"sz_b" > 0 &&
            $"inter" * 5 >= least($"sz_a", $"sz_b") * 4)
          // shuffle barrier before the sort: the verify pipeline is
          // broadcast-join-only (no exchange), so orderBy's range-
          // sampling job would otherwise re-execute the whole kernel
          // pass over every candidate pair (measured 2x); the barrier
          // holds only the filtered survivors
          .repartition($"a")
          .select($"a", $"b", $"inter",
            round($"inter".cast("double") / $"sz_a", 6).as("cont_ab"),
            round($"inter".cast("double") / $"sz_b", 6).as("cont_ba"))
          .orderBy($"a", $"b")
      },
      Some(s"""WITH $dCandidateCtes,
              |sh AS (SELECT doc_id, $dShingles3 AS sh
              |  FROM documents),
              |scored AS (
              |  SELECT c.a, c.b,
              |    len(x.sh) AS sz_a, len(y.sh) AS sz_b,
              |    len(x.sh) + len(y.sh) -
              |      len(list_distinct(list_concat(x.sh, y.sh)))
              |      AS inter
              |  FROM cand c JOIN sh x ON x.doc_id = c.a
              |              JOIN sh y ON y.doc_id = c.b
              |  WHERE len(x.sh) > 0 AND len(y.sh) > 0),
              |r AS (SELECT a, b, CAST(inter AS BIGINT) AS inter,
              |  round(CAST(inter AS DOUBLE) / sz_a, 6) AS cont_ab,
              |  round(CAST(inter AS DOUBLE) / sz_b, 6) AS cont_ba
              |  FROM scored
              |  WHERE inter * 5 >= least(sz_a, sz_b) * 4)
              |SELECT a, b, inter, cont_ab, cont_ba FROM r
              |ORDER BY a, b""".stripMargin)),

    // ---- q157: two-sample Kolmogorov-Smirnov drift test — the
    // distribution-shift gate between two corpus slices (here the
    // quality-score distributions of src0 vs src1; complements q133's
    // categorical TV distance with a CONTINUOUS-distribution test).
    // Exact integer formulation: D = max|F1-F2| is computed as
    // max|cum_c1*n2 - cum_c2*n1| over the DISTINCT-score table (the
    // only window — bounded by the 6-dp score domain, never corpus
    // rows), divided once at the end. No float CDF ever compared ----
    Q("q157_ks_drift",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sc = T(s, d, "documents")
          .where($"source".isin("src0", "src1"))
          .select(TextFunctions.qualityScore($"text").as("score"),
            when($"source" === "src0", 1L).otherwise(0L).as("is1"))
        val g = sc.groupBy($"score")
          .agg(sum($"is1").as("c1"),
            (count(lit(1)) - sum($"is1")).as("c2"))
        val tot = g.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
        val w = Window.orderBy($"score")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.withColumn("f1", sum($"c1").over(w))
          .withColumn("f2", sum($"c2").over(w))
          .crossJoin(broadcast(tot))
          .agg(max($"n1").as("n1"), max($"n2").as("n2"),
            max(abs($"f1" * $"n2" - $"f2" * $"n1")).as("ks_num"))
          // a missing slice (n1 or n2 = 0): KS undefined -> NULL on
          // BOTH engines (DuckDB /0 is NULL, Spark double/0 is NaN —
          // the q184/q192/q194 guard class)
          .select($"n1", $"n2", $"ks_num",
            when($"n1" * $"n2" === 0, lit(null).cast("double"))
              .otherwise(round($"ks_num".cast("double") /
                ($"n1".cast("double") * $"n2"), 6)).as("ks"))
      },
      Some(s"""WITH f AS ($dQualityFeatures, source
              |  FROM documents WHERE source IN ('src0', 'src1')),
              |sc AS (SELECT $dQualityExpr AS score,
              |  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is1
              |  FROM f),
              |g AS (SELECT score, sum(is1) AS c1,
              |        count(*) - sum(is1) AS c2
              |      FROM sc GROUP BY score),
              |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
              |c AS (SELECT score,
              |  sum(c1) OVER (ORDER BY score
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS f1,
              |  sum(c2) OVER (ORDER BY score
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS f2
              |  FROM g)
              |SELECT CAST(t.n1 AS BIGINT) AS n1,
              |  CAST(t.n2 AS BIGINT) AS n2,
              |  CAST(max(abs(c.f1 * t.n2 - c.f2 * t.n1)) AS BIGINT)
              |    AS ks_num,
              |  round(CAST(max(abs(c.f1 * t.n2 - c.f2 * t.n1))
              |      AS DOUBLE) / (CAST(t.n1 AS DOUBLE) * t.n2), 6)
              |    AS ks
              |FROM c, t GROUP BY t.n1, t.n2""".stripMargin)),

    // ---- q159: reciprocal-rank fusion — the standard late-fusion of
    // a SPARSE ranking (q82's BM25 top-20) and a DENSE ranking (q28's
    // brute cosine top-20) into one retrieval list:
    // rrf(d) = Σ_lists 1/(60 + rank_d). Hybrid search is how
    // production RAG retrieval actually ranks; both input rankings
    // tiebreak on id so the top-20 cutsets are deterministic, the
    // fused score is the identical two-term double expression on both
    // engines, and the final top-10 tiebreaks on id again ----
    Q("q159_rrf_fusion",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
        val emb = T(s, d, "embeddings")
        // sparse side: q82's BM25 exactly, incl. its STAGED dl
        // artifact — one tokenize pass per corpus per JVM serves both
        // queries' three dl consumers each
        val terms = Seq("spark", "join", "filter")
        val dl = TextFunctions.stagedDocLengths(docs, "text", "doc_id",
          cacheKey = d)
        val r = dl.agg(count(lit(1)), sum($"dl")).first()
        val nDocs = r.getLong(0)
        val avgdl = r.getLong(1).toDouble / nDocs.toDouble
        val tf = docs.select($"doc_id",
            explode(TextFunctions.tokens($"text")).as("token"))
          .where($"token".isin(terms: _*))
          .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
        val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
        val idf = (lit(nDocs.toDouble) - $"df" + lit(0.5)) /
          ($"df" + lit(0.5))
        val num = $"c".cast("double") * lit(2.2)
        val den = $"c".cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * ($"dl".cast("double") / lit(avgdl)))
        val bm25 = tf.join(broadcast(df), "token")
          .join(dl, "doc_id")
          .select($"doc_id",
            round(idf * (num / den), 6).cast("decimal(18,6)")
              .as("contrib"))
          .groupBy($"doc_id")
          .agg(sum($"contrib").cast("double").as("score"))
          .orderBy($"score".desc, $"doc_id".asc).limit(20)
          .withColumn("rb", row_number().over(Window
            .orderBy($"score".desc, $"doc_id".asc)).cast("long"))
          .select($"doc_id".as("id"), $"rb")
        // dense side: q28's brute cosine top-20 exactly
        val query = emb.where($"vec_id" === 0L)
          .select($"embedding".cast("array<double>")).head()
          .getSeq[Double](0)
        val dense = Similarity.cosineTopK(emb, "embedding", "vec_id",
            query, 20)
          .withColumn("rc", row_number().over(Window
            .orderBy($"score".desc, $"vec_id".asc)).cast("long"))
          .select($"vec_id".as("id"), $"rc")
        bm25.join(dense, Seq("id"), "full_outer")
          .select($"id", $"rb", $"rc",
            (coalesce(lit(1.0) / ($"rb" + 60), lit(0.0)) +
              coalesce(lit(1.0) / ($"rc" + 60), lit(0.0))).as("rrf0"))
          .orderBy($"rrf0".desc, $"id")
          .limit(10)
          .select($"id", $"rb", $"rc", round($"rrf0", 6).as("rrf"))
      },
      Some(s"""WITH dl AS (SELECT doc_id,
              |  CAST(len($dTokens) AS BIGINT) AS dl FROM documents),
              |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
              |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              |    AS avgdl FROM dl),
              |tok AS (SELECT doc_id, unnest($dTokens) AS token
              |        FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS c FROM tok
              |       WHERE token IN ('spark', 'join', 'filter')
              |       GROUP BY doc_id, token),
              |df AS (SELECT token, count(*) AS df FROM tf
              |       GROUP BY token),
              |sc AS (SELECT tf.doc_id,
              |  CAST(round(((st.n - df.df + 0.5) / (df.df + 0.5))
              |    * ((CAST(c AS DOUBLE) * 2.2)
              |       / (CAST(c AS DOUBLE) + 1.2 * (0.25 + 0.75
              |          * (CAST(dl.dl AS DOUBLE) / st.avgdl)))), 6)
              |    AS DECIMAL(18,6)) AS contrib
              |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), st),
              |bs AS (SELECT doc_id, CAST(sum(contrib) AS DOUBLE)
              |         AS score
              |       FROM sc GROUP BY doc_id
              |       ORDER BY score DESC, doc_id LIMIT 20),
              |bm25 AS (SELECT doc_id AS id,
              |  CAST(row_number() OVER (ORDER BY score DESC, doc_id)
              |    AS BIGINT) AS rb FROM bs),
              |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
              |      FROM embeddings WHERE vec_id = 0),
              |dsc AS (SELECT vec_id,
              |  list_sum(list_transform(generate_series(1, 64), i ->
              |    CAST(embedding[CAST(i AS INT)] AS DOUBLE)
              |    * qv[CAST(i AS INT)])) AS dt,
              |  sqrt(list_sum(list_transform(embedding, x ->
              |    CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
              |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
              |  FROM embeddings, q),
              |ds AS (SELECT vec_id,
              |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
              |        ELSE dt / (nv * nq) END, 6) AS score
              |  FROM dsc
              |  ORDER BY score DESC, vec_id LIMIT 20),
              |dense AS (SELECT vec_id AS id,
              |  CAST(row_number() OVER (ORDER BY score DESC, vec_id)
              |    AS BIGINT) AS rc FROM ds),
              |fused AS (SELECT coalesce(b.id, c.id) AS id, b.rb, c.rc,
              |  coalesce(1.0 / (b.rb + 60), 0.0) +
              |  coalesce(1.0 / (c.rc + 60), 0.0) AS rrf0
              |  FROM bm25 b FULL OUTER JOIN dense c ON b.id = c.id)
              |SELECT id, rb, rc, round(rrf0, 6) AS rrf
              |FROM fused ORDER BY rrf0 DESC, id LIMIT 10"""
        .stripMargin)),

    // ---- q160: BFS reachability depth from a seed over the kNN
    // similarity graph — min-hop distance (<= 3) from vec 0, the
    // "how far does this near-dup neighbourhood extend" probe and the
    // building block of diffusion-style label spreading. Three
    // unrolled frontier joins over the symmetrized q92/q119 edge set
    // (bounded probe batch -> edge set is constant-size at any SF);
    // min-hop resolved by one groupBy over the hop-labelled union ----
    Q("q160_bfs_hops",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        val und = Similarity.stagedKnnEdges(emb, 3, d)
          .select(least($"src", $"dst").as("a"),
            greatest($"src", $"dst").as("b")).distinct()
        val adj = und.unionAll(und.select($"b".as("a"), $"a".as("b")))
        val h0 = T(s, d, "embeddings").where($"vec_id" === 0L)
          .select($"vec_id".as("node"), lit(0L).as("hop"))
        val h1 = adj.where($"a" === 0L)
          .select($"b".as("node"), lit(1L).as("hop")).distinct()
        val h2 = adj.join(h1.select($"node".as("a")), "a")
          .select($"b".as("node"), lit(2L).as("hop")).distinct()
        val h3 = adj.join(h2.select($"node".as("a")), "a")
          .select($"b".as("node"), lit(3L).as("hop")).distinct()
        h0.unionAll(h1).unionAll(h2).unionAll(h3)
          .groupBy($"node").agg(min($"hop").as("hop"))
          .orderBy($"node")
      },
      Some("""WITH e AS (SELECT vec_id,
             |            CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |q AS (SELECT vec_id AS src, v AS qv FROM e
             |      WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |sc AS (SELECT q.src, e.vec_id AS dst,
             |  list_sum(list_transform(generate_series(1, 64), i ->
             |    v[CAST(i AS INT)] * qv[CAST(i AS INT)])) AS dt,
             |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nv,
             |  sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |  FROM e, q WHERE e.vec_id != q.src),
             |scored AS (SELECT src, dst,
             |  round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |        ELSE dt / (nv * nq) END, 6) AS score
             |  FROM sc),
             |knn AS (SELECT src, dst FROM (
             |  SELECT src, dst, row_number() OVER (PARTITION BY src
             |    ORDER BY score DESC, dst ASC) AS rank
             |  FROM scored) WHERE rank <= 3),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |                        greatest(src, dst) AS b
             |        FROM knn),
             |adj AS (SELECT a, b FROM und
             |        UNION ALL SELECT b, a FROM und),
             |h1 AS (SELECT DISTINCT b AS node FROM adj WHERE a = 0),
             |h2 AS (SELECT DISTINCT adj.b AS node FROM adj
             |       JOIN h1 ON h1.node = adj.a),
             |h3 AS (SELECT DISTINCT adj.b AS node FROM adj
             |       JOIN h2 ON h2.node = adj.a),
             |u AS (SELECT vec_id AS node, 0 AS hop
             |    FROM embeddings WHERE vec_id = 0
             |  UNION ALL SELECT node, 1 FROM h1
             |  UNION ALL SELECT node, 2 FROM h2
             |  UNION ALL SELECT node, 3 FROM h3)
             |SELECT node, CAST(min(hop) AS BIGINT) AS hop
             |FROM u GROUP BY node ORDER BY node""".stripMargin)),

    // ---- q161: per-source quantile normalization of the quality
    // score — map each doc's score to its percentile WITHIN its
    // source, so sources with systematically different raw-score
    // scales mix on one comparable axis (the cross-source calibration
    // step before a global quality threshold). One rank window
    // partitioned by source (co-keyed shuffle, never global), the
    // percentile is the exact rational (rank-1)/(n-1) rounded once ----
    Q("q161_quantile_normalize",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sc = T(s, d, "documents").select($"doc_id", $"source",
          TextFunctions.qualityScore($"text").as("score"))
        val w = Window.partitionBy($"source")
          .orderBy($"score", $"doc_id")
        val n = sc.groupBy($"source").agg(count(lit(1)).as("n_src"))
        sc.withColumn("rk", row_number().over(w).cast("long"))
          .join(broadcast(n), "source")
          .select($"doc_id", $"source", $"score", $"rk",
            round(($"rk" - 1).cast("double") /
              greatest($"n_src" - 1, lit(1L)), 6).as("pctl"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH f AS ($dQualityFeatures, source FROM documents),
              |sc AS (SELECT doc_id, source, $dQualityExpr AS score
              |       FROM f),
              |n AS (SELECT source, count(*) AS n_src FROM sc
              |      GROUP BY source),
              |r AS (SELECT doc_id, source, score,
              |  CAST(row_number() OVER (PARTITION BY source
              |    ORDER BY score, doc_id) AS BIGINT) AS rk
              |  FROM sc)
              |SELECT r.doc_id, r.source, r.score, r.rk,
              |  round(CAST(r.rk - 1 AS DOUBLE) /
              |    greatest(n.n_src - 1, 1), 6) AS pctl
              |FROM r JOIN n USING (source)
              |ORDER BY r.doc_id""".stripMargin)),

    // ---- q162: cross-source duplication matrix — where near-dups
    // COME FROM: verified near-dup pairs (the q27 staged artifact,
    // materialized once per corpus and reused here) rolled up by
    // unordered source pair. The corpus-forensics view that decides
    // which source to trim when two feeds mirror each other. Two
    // dimension joins on doc_id + one tiny agg; sources are
    // alphabetically normalized so each pair counts once ----
    Q("q162_crossdup_matrix",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val pairs = Dedup.stagedNearDupPairs(docs, "text", "doc_id",
          cacheKey = d, threshold = 0.5, ngram = 3)
        val src = docs.select($"doc_id", $"source")
        pairs
          .join(src.select($"doc_id".as("a"), $"source".as("sa")), "a")
          .join(src.select($"doc_id".as("b"), $"source".as("sb")), "b")
          .select(least($"sa", $"sb").as("s1"),
            greatest($"sa", $"sb").as("s2"))
          .groupBy($"s1", $"s2").agg(count(lit(1)).as("n_pairs"))
          .orderBy($"s1", $"s2")
      },
      Some(s"""WITH $dCandidateCtes,
              |${dVerifiedPairCtes(0.5)},
              |m AS (SELECT least(da.source, db.source) AS s1,
              |             greatest(da.source, db.source) AS s2
              |      FROM p JOIN documents da ON da.doc_id = p.a
              |             JOIN documents db ON db.doc_id = p.b)
              |SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_pairs
              |FROM m GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin)),

    // ---- q163: thumbnail resize over REAL decoded pixels — the
    // image-ingest downsample step: encode real PNGs, round-trip them
    // through parquet BINARY storage, decode with ImageIO, take the
    // nearest-neighbour half-size thumbnail, and emit an exact
    // position-weighted integer checksum of the thumb's luminances.
    // The oracle recomputes the identical checksum from the source
    // TEXT alone (the lossless pixel rule), so the gate proves the
    // decode+resample math, not just byte equality ----
    Q("q163_thumbnail_resize",
      (s, d) => {
        import s.implicits._
        val pngs = Multimodal.imagesFromText(
          T(s, d, "documents"), "text", "doc_id")
        val dir = graft.TempDirs.create("graft-q163-png")
        pngs.write.mode("overwrite").parquet(dir)
        Multimodal.imageThumbnail(
            s.read.schema("asset_id BIGINT, png BINARY").parquet(dir),
            "png", "asset_id")
          .select($"asset_id", $"w".cast("long").as("w"),
            $"h".cast("long").as("h"), $"w2".cast("long").as("w2"),
            $"h2".cast("long").as("h2"), $"checksum")
          .orderBy($"asset_id")
      },
      Some {
        def ch(c: Int): String =
          s"""unicode(text[CAST((3*((2*(j//w2))*w + 2*(j%w2)) + $c)
             |  % len AS INT) + 1
             |  : CAST((3*((2*(j//w2))*w + 2*(j%w2)) + $c)
             |  % len AS INT) + 1]) % 256""".stripMargin
        s"""WITH px AS (
           |  SELECT doc_id, text, length(text) AS len,
           |         4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
           |  FROM documents WHERE length(text) > 0),
           |dims AS (SELECT doc_id, text, len, w, h,
           |  (w + 1) // 2 AS w2, (h + 1) // 2 AS h2 FROM px),
           |cs AS (SELECT doc_id, w, h, w2, h2,
           |  CAST(list_sum(list_transform(
           |    generate_series(0, w2 * h2 - 1), j ->
           |      (j + 1) * (${ch(0)}
           |               + ${ch(1)}
           |               + ${ch(2)}))) AS BIGINT) AS checksum
           |  FROM dims)
           |SELECT doc_id AS asset_id, CAST(w AS BIGINT) AS w,
           |  CAST(h AS BIGINT) AS h, CAST(w2 AS BIGINT) AS w2,
           |  CAST(h2 AS BIGINT) AS h2, checksum
           |FROM cs ORDER BY asset_id""".stripMargin
      }),

    // ---- q165: Pareto concentration curve of the token budget —
    // what share of documents carries what share of tokens (the
    // "do 20% of docs hold 80% of the corpus" curation question that
    // decides where a length cap or a dedup pass pays off). The
    // cumulative window runs over the DISTINCT token-count histogram
    // (bounded value domain), never corpus rows; shares are one
    // rounded division off exact integer prefix sums ----
    Q("q165_pareto_curve",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val g = T(s, d, "documents")
          .select(size(TextFunctions.tokens($"text")).cast("long")
            .as("tc"))
          .groupBy($"tc").agg(count(lit(1)).as("n_docs"))
        val tot = g.agg(sum($"n_docs").cast("double").as("td"),
          sum($"tc" * $"n_docs").cast("double").as("tt"))
        val w = Window.orderBy($"tc".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.withColumn("cum_docs", sum($"n_docs").over(w))
          .withColumn("cum_tokens", sum($"tc" * $"n_docs").over(w))
          .crossJoin(broadcast(tot))
          .select($"tc", $"n_docs", $"cum_docs", $"cum_tokens",
            round($"cum_docs" / $"td", 6).as("doc_share"),
            round($"cum_tokens" / $"tt", 6).as("token_share"))
          .orderBy($"tc".desc)
      },
      Some(s"""WITH tcs AS (SELECT CAST(len($dTokens) AS BIGINT)
              |    AS tc FROM documents),
              |g AS (SELECT tc, count(*) AS n_docs FROM tcs
              |      GROUP BY tc),
              |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS td,
              |  CAST(sum(tc * n_docs) AS DOUBLE) AS tt FROM g),
              |c AS (SELECT tc, n_docs,
              |  sum(n_docs) OVER (ORDER BY tc DESC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS cum_docs,
              |  sum(tc * n_docs) OVER (ORDER BY tc DESC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS cum_tokens
              |  FROM g)
              |SELECT c.tc, CAST(c.n_docs AS BIGINT) AS n_docs,
              |  CAST(c.cum_docs AS BIGINT) AS cum_docs,
              |  CAST(c.cum_tokens AS BIGINT) AS cum_tokens,
              |  round(c.cum_docs / t.td, 6) AS doc_share,
              |  round(c.cum_tokens / t.tt, 6) AS token_share
              |FROM c, t ORDER BY c.tc DESC""".stripMargin)),

    // ---- q166: verify-stage threshold sweep — for each candidate
    // Jaccard threshold, how many verified pairs survive and how many
    // documents the drop-policy would remove. Complements q141 (which
    // tunes the CANDIDATE-generation bands): this tunes the verify
    // cut, from the staged pair artifact (materialized once, reused —
    // never re-scoring), so sweeping 5 thresholds costs 5 passes over
    // a pair list, not 5 dedup runs ----
    Q("q166_threshold_sweep",
      (s, d) => {
        import s.implicits._
        val pairs = Dedup.stagedNearDupPairs(T(s, d, "documents"),
          "text", "doc_id", cacheKey = d, threshold = 0.5, ngram = 3)
        val ths = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
        pairs.select($"jaccard", $"b")
          .crossJoin(broadcast(
            Seq(ths).toDF("ts").select(explode($"ts").as("t"))))
          .where($"jaccard" >= $"t")
          .groupBy($"t")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct($"b").as("n_dropped"))
          .orderBy($"t")
      },
      Some(s"""WITH $dCandidateCtes,
              |${dVerifiedPairCtes(0.5)},
              |th AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9])
              |              AS DOUBLE) AS t)
              |SELECT th.t, CAST(count(*) AS BIGINT) AS n_pairs,
              |  CAST(count(DISTINCT p.b) AS BIGINT) AS n_dropped
              |FROM p JOIN th ON p.jaccard >= th.t
              |GROUP BY th.t ORDER BY th.t""".stripMargin)),

    // ---- q170: human-audit sampling of verified near-dup pairs —
    // up to 2 pairs per Jaccard decile, picked by md5 rank so the
    // audit sheet is deterministic, unbiased by id order, and
    // reproducible across runs (the QA step that calibrates the q166
    // threshold choice against human judgment). Reads the staged pair
    // artifact; the only window partitions by decile (≤ 6 keys, each
    // rank-2-pruned by WindowGroupLimit) ----
    Q("q170_dup_audit_sample",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val pairs = Dedup.stagedNearDupPairs(T(s, d, "documents"),
          "text", "doc_id", cacheKey = d, threshold = 0.5, ngram = 3)
        val w = Window.partitionBy($"decile")
          .orderBy($"pick", $"a", $"b")
        pairs
          .withColumn("decile",
            floor($"jaccard" * 10).cast("long"))
          .withColumn("pick", md5(concat($"a".cast("string"),
            lit("|"), $"b".cast("string"))))
          .withColumn("rk", row_number().over(w).cast("long"))
          .where($"rk" <= 2)
          .select($"decile", $"rk", $"a", $"b", $"jaccard")
          .orderBy($"decile", $"rk")
      },
      Some(s"""WITH $dCandidateCtes,
              |${dVerifiedPairCtes(0.5)},
              |r AS (SELECT CAST(floor(jaccard * 10) AS BIGINT)
              |        AS decile, a, b, jaccard,
              |  CAST(row_number() OVER (
              |    PARTITION BY CAST(floor(jaccard * 10) AS BIGINT)
              |    ORDER BY md5(CAST(a AS VARCHAR) || '|' ||
              |                 CAST(b AS VARCHAR)), a, b)
              |    AS BIGINT) AS rk
              |  FROM p)
              |SELECT decile, rk, a, b, jaccard FROM r
              |WHERE rk <= 2 ORDER BY decile, rk""".stripMargin)),

    // ---- q171: dedup component-size histogram — the macro view of
    // duplication structure (how many pairs, triples, ... giant
    // cluster) that q57's per-doc labels don't surface directly; the
    // size distribution is what decides whether near-dup mass is
    // boilerplate families (many small) or mirrored feeds (few
    // giant). Reads the staged component artifact; two tiny aggs ----
    Q("q171_component_histogram",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val comp = Dedup.stagedComponents(docs, "text", "doc_id",
            cacheKey = d, threshold = 0.5, ngram = 3)
          .withColumnRenamed("id", "doc_id")
        docs.select($"doc_id")
          .join(comp, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"component", $"doc_id").as("component"))
          .groupBy($"component").agg(count(lit(1)).as("sz"))
          .groupBy($"sz").agg(count(lit(1)).as("n_components"))
          .select($"sz", $"n_components",
            ($"sz" * $"n_components").as("n_docs"))
          .orderBy($"sz")
      },
      Some(s"""WITH RECURSIVE $dCandidateCtes,
              |${dNearDupDropCtes("documents", 0.5)},
              |edges AS (
              |  SELECT a, b FROM scored
              |  WHERE round(CASE WHEN un = 0 THEN 0.0
              |        ELSE CAST(st - un AS DOUBLE) / un END, 6)
              |        >= 0.5),
              |und AS (SELECT a, b FROM edges
              |        UNION SELECT b AS a, a AS b FROM edges),
              |reach AS (
              |  SELECT doc_id AS src, doc_id AS node FROM documents
              |  UNION
              |  SELECT r.src, u.b AS node
              |  FROM reach r JOIN und u ON u.a = r.node),
              |comp AS (
              |  SELECT src AS doc_id, min(node) AS component
              |  FROM reach GROUP BY src),
              |sizes AS (SELECT component, count(*) AS sz
              |          FROM comp GROUP BY component)
              |SELECT CAST(sz AS BIGINT) AS sz,
              |  CAST(count(*) AS BIGINT) AS n_components,
              |  CAST(sz * count(*) AS BIGINT) AS n_docs
              |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin)),

    // ---- q172: train/val/test LEAKAGE audit — verified near-dup
    // pairs whose members land in DIFFERENT q58 splits. Exact-dup
    // leakage is what decontamination (q63/q108) catches; NEAR-dup
    // leakage across the split boundary is the quieter eval inflation
    // this matrix surfaces before anyone trusts a validation number.
    // Staged pair artifact + two broadcastable split-assign joins
    // (splits are pure hash projections, no data motion) ----
    Q("q172_split_leakage",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val pairs = Dedup.stagedNearDupPairs(docs, "text", "doc_id",
          cacheKey = d, threshold = 0.5, ngram = 3)
        val splits = Seq("train" -> 8000, "val" -> 1000,
          "test" -> 1000)
        val sp = docs.select($"doc_id",
          Curate.splitAssign($"doc_id", splits).as("split"))
        pairs
          .join(sp.select($"doc_id".as("a"), $"split".as("split_a")),
            Seq("a"))
          .join(sp.select($"doc_id".as("b"), $"split".as("split_b")),
            Seq("b"))
          .groupBy($"split_a", $"split_b")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when($"split_a" =!= $"split_b", 1L).otherwise(0L))
              .as("n_leaked"))
          .orderBy($"split_a", $"split_b")
      },
      Some(s"""WITH $dCandidateCtes,
              |${dVerifiedPairCtes(0.5)},
              |sp AS (SELECT doc_id,
              |  CASE WHEN CAST(concat('0x', substr(md5(concat('graft',
              |         CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
              |         % 10000 < 8000 THEN 'train'
              |       WHEN CAST(concat('0x', substr(md5(concat('graft',
              |         CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
              |         % 10000 < 9000 THEN 'val'
              |       ELSE 'test' END AS split
              |  FROM documents)
              |SELECT sa.split AS split_a, sb.split AS split_b,
              |  CAST(count(*) AS BIGINT) AS n_pairs,
              |  CAST(sum(CASE WHEN sa.split != sb.split
              |           THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
              |FROM p JOIN sp sa ON sa.doc_id = p.a
              |       JOIN sp sb ON sb.doc_id = p.b
              |GROUP BY sa.split, sb.split
              |ORDER BY split_a, split_b""".stripMargin)),

    // ---- q174: dataset card — the one-row corpus summary a release
    // ships with (counts, token volume, language/source breadth,
    // exact-dup mass, verified near-dup pair count, mean quality).
    // Every number is an exact integer or a DECIMAL-exact mean; the
    // near-dup count reads the staged artifact rather than re-running
    // the kernel (PlanSpec's q100 rule) ----
    Q("q174_dataset_card",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          sum(size(TextFunctions.tokens($"text")).cast("long"))
            .as("n_tokens"),
          countDistinct($"source").as("n_sources"),
          countDistinct($"lang").as("n_langs"),
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("en_docs"),
          (count(lit(1)) - countDistinct(
            TextFunctions.fingerprint($"text"))).as("n_exact_dup"),
          round(sum(TextFunctions.qualityScore($"text")
            .cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("mean_quality"))
        val nd = Dedup.stagedNearDupPairs(docs, "text", "doc_id",
            cacheKey = d, threshold = 0.5, ngram = 3)
          .agg(count(lit(1)).as("n_neardup_pairs"))
        base.crossJoin(nd)
      },
      Some(s"""WITH $dCandidateCtes,
              |${dVerifiedPairCtes(0.5)},
              |np AS (SELECT count(*) AS n_neardup_pairs FROM p),
              |f AS ($dQualityFeatures FROM documents),
              |q AS (SELECT $dQualityExpr AS quality FROM f),
              |base AS (SELECT
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(len($dTokens)) AS BIGINT) AS n_tokens,
              |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              |       AS BIGINT) AS en_docs,
              |  CAST(count(*) - count(DISTINCT
              |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
              |        'g'))) AS BIGINT) AS n_exact_dup
              |  FROM documents),
              |mq AS (SELECT round(CAST(sum(CAST(quality
              |    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
              |    AS mean_quality FROM q)
              |SELECT base.*, mq.mean_quality,
              |  CAST(np.n_neardup_pairs AS BIGINT) AS n_neardup_pairs
              |FROM base, mq, np""".stripMargin)),

    // ---- q175: Heaps'-law vocabulary growth curve — distinct types
    // seen vs tokens processed, at 10 equal checkpoints of the global
    // token stream (the measurement that sizes a tokenizer vocab and
    // predicts OOV decay). Global token positions come from the
    // two-phase tokenStarts prefix scan (+ in-doc offset), NEVER a
    // corpus-wide row window; first occurrences are a min-agg; the
    // only window is a 10-row decile cumsum ----
    Q("q175_heaps_curve",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val tk = T(s, d, "documents")
          .select($"doc_id", TextFunctions.tokens($"text").as("t"))
        val starts = Curate.tokenStarts(
          tk.select($"doc_id", size($"t").cast("long").as("w")),
          "doc_id", $"w")
        val pos = tk.join(starts.select($"doc_id", $"start"), "doc_id")
          .select($"start", posexplode($"t"))
          .select(col("col").as("w"),
            ($"start" + $"pos").as("gpos"))
        val nt = starts.agg(sum($"tok").as("nt"))
        val firsts = pos.groupBy($"w").agg(min($"gpos").as("fp"))
        val hist = firsts.crossJoin(broadcast(nt))
          .groupBy(expr("(fp * 10) div nt").as("decile"))
          .agg(count(lit(1)).as("n_new_types"))
        val deciles = s.range(0, 10).select($"id".as("decile"))
        val w = Window.orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deciles.join(hist, Seq("decile"), "left")
          .withColumn("n_new_types",
            coalesce($"n_new_types", lit(0L)))
          .crossJoin(broadcast(nt))
          .select($"decile",
            expr("((decile + 1) * nt) div 10").as("boundary_tokens"),
            $"n_new_types",
            sum($"n_new_types").over(w).as("cum_types"))
          .orderBy($"decile")
      },
      Some(s"""WITH t AS (SELECT doc_id, $dTokens AS t
              |          FROM documents),
              |e AS (SELECT doc_id, i, t[CAST(i AS INT)] AS w
              |      FROM (SELECT doc_id, t,
              |              unnest(generate_series(1, len(t))) AS i
              |            FROM t)),
              |gp AS (SELECT w,
              |  row_number() OVER (ORDER BY doc_id, i) - 1 AS gpos
              |  FROM e),
              |nt AS (SELECT count(*) AS nt FROM gp),
              |f AS (SELECT w, min(gpos) AS fp FROM gp GROUP BY w),
              |h AS (SELECT (f.fp * 10) // nt.nt AS decile,
              |        count(*) AS n_new FROM f, nt GROUP BY 1),
              |ds AS (SELECT unnest(generate_series(0, 9)) AS decile)
              |SELECT CAST(ds.decile AS BIGINT) AS decile,
              |  CAST(((ds.decile + 1) * nt.nt) // 10 AS BIGINT)
              |    AS boundary_tokens,
              |  CAST(coalesce(h.n_new, 0) AS BIGINT) AS n_new_types,
              |  CAST(sum(coalesce(h.n_new, 0)) OVER (
              |    ORDER BY ds.decile
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS BIGINT) AS cum_types
              |FROM ds LEFT JOIN h USING (decile), nt
              |ORDER BY decile""".stripMargin)),

    // ---- q176: sketch calibration — minhash-estimated Jaccard
    // (matching signature fraction, 16 permutations) vs the TRUE
    // n-gram Jaccard, per verified near-dup pair. The accuracy audit
    // that justifies (or indicts) the LSH stage's sketch parameters,
    // in the q112/q113 tradition of gating estimators against exact
    // answers. Pair list is the staged artifact; the signature join
    // is two broadcastable probes; est is the exact rational m/16 ----
    Q("q176_sketch_calibration",
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents")
        val pairs = Dedup.stagedNearDupPairs(docs, "text", "doc_id",
          cacheKey = d, threshold = 0.5, ngram = 3)
        val sig = docs.select($"doc_id",
          TextFunctions.minhashSignature($"text", 16).as("sig"))
        // positional match count as 16 unrolled element_at terms:
        // HOF lambdas (aggregate/zip_with) run interpreted per element
        // and this expression runs once per VERIFIED PAIR (978K rows
        // at sf0.1) — the unrolled form whole-stage-codegens (r15 opt,
        // guide §"expressions and codegen"); value-identical (same
        // positional equality, same 0/1 sum)
        val m = (1 to 16).map(i =>
          when(element_at($"sa", i) === element_at($"sb", i), 1L)
            .otherwise(0L)).reduce(_ + _)
        pairs
          .join(sig.select($"doc_id".as("a"), $"sig".as("sa")), Seq("a"))
          .join(sig.select($"doc_id".as("b"), $"sig".as("sb")), Seq("b"))
          .select($"a", $"b", $"jaccard", m.as("m"))
          .select($"a", $"b", $"jaccard",
            round($"m".cast("double") / 16, 6).as("est"),
            round($"m".cast("double") / 16 - $"jaccard", 6)
              .as("err"))
          .orderBy($"a", $"b")
      },
      Some(s"""WITH $dCandidateCtes,
              |${dVerifiedPairCtes(0.5)},
              |m AS (SELECT p.a, p.b, p.jaccard,
              |  CAST(list_sum(list_transform(generate_series(1, 16),
              |    i -> CASE WHEN x.sig[CAST(i AS INT)]
              |                  = y.sig[CAST(i AS INT)]
              |              THEN 1 ELSE 0 END)) AS BIGINT) AS m
              |  FROM p JOIN sig x ON x.doc_id = p.a
              |         JOIN sig y ON y.doc_id = p.b)
              |SELECT a, b, jaccard,
              |  round(CAST(m AS DOUBLE) / 16, 6) AS est,
              |  round(CAST(m AS DOUBLE) / 16 - jaccard, 6) AS err
              |FROM m ORDER BY a, b""".stripMargin)),

    // ---- q177: calibration bins (reliability diagram) for the
    // quality score as an en-classifier — the per-bin positive rate
    // that complements q152's threshold-free AUC: a well-calibrated
    // score has pos_rate tracking the bin. 10 clamped score bins,
    // DECIMAL-exact mean score per bin, exact integer rates ----
    Q("q177_quality_calibration",
      (s, d) => {
        import s.implicits._
        val sc = T(s, d, "documents").select(
          TextFunctions.qualityScore($"text").as("score"),
          when($"lang" === "en", 1L).otherwise(0L).as("pos"))
        sc.groupBy(least(floor($"score" * 10), lit(9L)).cast("long")
            .as("bin"))
          .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
            round(sum($"score".cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6).as("mean_score"))
          .withColumn("pos_rate",
            round($"n_pos".cast("double") / $"n", 6))
          .orderBy($"bin")
      },
      Some(s"""WITH f AS ($dQualityFeatures,
              |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              |  FROM documents),
              |sc AS (SELECT $dQualityExpr AS score, pos FROM f),
              |g AS (SELECT least(CAST(floor(score * 10) AS BIGINT),
              |        9) AS bin,
              |  count(*) AS n, sum(pos) AS n_pos,
              |  round(CAST(sum(CAST(score AS DECIMAL(18,6)))
              |    AS DOUBLE) / count(*), 6) AS mean_score
              |  FROM sc GROUP BY 1)
              |SELECT CAST(bin AS BIGINT) AS bin,
              |  CAST(n AS BIGINT) AS n,
              |  CAST(n_pos AS BIGINT) AS n_pos, mean_score,
              |  round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate
              |FROM g ORDER BY bin""".stripMargin)),

    // ---- q180: grouped top-k — the best 3 documents per source by
    // quality (the per-feed showcase/spot-check every curation run
    // exports). The rank-filter shape Spark rewrites to
    // WindowGroupLimit: each source's partition keeps a 3-row heap
    // instead of fully sorting, so the operator is shuffle-once and
    // memory-O(k) per group at any corpus size (PlanSpec pins the
    // rewrite fired) ----
    Q("q180_grouped_topk",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sc = T(s, d, "documents").select($"doc_id", $"source",
          TextFunctions.qualityScore($"text").as("score"))
        val w = Window.partitionBy($"source")
          .orderBy($"score".desc, $"doc_id")
        sc.withColumn("rk", row_number().over(w).cast("long"))
          .where($"rk" <= 3)
          .select($"source", $"rk", $"doc_id", $"score")
          .orderBy($"source", $"rk")
      },
      Some(s"""WITH f AS ($dQualityFeatures, source FROM documents),
              |sc AS (SELECT doc_id, source, $dQualityExpr AS score
              |       FROM f),
              |r AS (SELECT source, doc_id, score,
              |  CAST(row_number() OVER (PARTITION BY source
              |    ORDER BY score DESC, doc_id) AS BIGINT) AS rk
              |  FROM sc)
              |SELECT source, rk, doc_id, score FROM r
              |WHERE rk <= 3 ORDER BY source, rk""".stripMargin)),

    // ---- q183: top principal direction of the embedding cloud by
    // TWO unrolled power-iteration steps (u0 = e1) — the embedding-
    // space analysis op behind anisotropy checks and whitening
    // decisions. Every corpus-sized sum is quantized to exact 1e-6
    // BIGINTs BEFORE aggregation (the q123/q119 integer-exactness
    // rule), so shuffle order can't move a bit; normalization is
    // sqrt/÷ (correctly-rounded IEEE) in identical shapes on both
    // engines. The iter-1 result reaches iter 2 as EXACT integers
    // (collected s_d longs -> driver-rebuilt doubles == the oracle's
    // CTE arithmetic bit-for-bit); each iteration is one corpus scan ----
    Q("q183_pca_direction",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        // iteration 1: dot = <v, e1> = v[0]; s_d = Σ round(v[d]*dot*1e6)
        val it1 = emb
          .select(posexplode($"v").as(Seq("d0", "x")),
            element_at($"v", 1).as("dot"))
          .groupBy(($"d0" + 1).cast("long").as("dim"))
          .agg(sum(round($"x" * $"dot" * 1e6, 0).cast("long")).as("s"))
        val s1 = it1.orderBy($"dim").select($"s").as[Long].collect()
        val w1 = s1.map(_.toDouble / 1e6)
        val n1 = math.sqrt(w1.foldLeft(0.0)((a, x) => a + x * x))
        val u1 = w1.map(_ / n1).toSeq
        // iteration 2 with u1 as a literal: sequential fold dot,
        // quantized per-dim sums, normalize, 6-dp display
        val it2 = emb
          .withColumn("u", typedlit(u1))
          .withColumn("dot", expr("aggregate(zip_with(v, u," +
            " (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
          .select(posexplode($"v").as(Seq("d0", "x")), $"dot")
          .groupBy(($"d0" + 1).cast("long").as("dim"))
          .agg(sum(round($"x" * $"dot" * 1e6, 0).cast("long")).as("s2"))
        // n2 via an ordered driver fold over the 64 EXACT s2 longs
        // (dimension-bounded, never corpus-sized) — a cross-row double
        // sum in the engine would accumulate in partial-agg arrival
        // order, which is nondeterministic and need not match the
        // oracle's; iteration 1 already does exactly this for n1
        val s2arr = it2.orderBy($"dim").select($"s2").as[Long].collect()
        val n2 = math.sqrt(s2arr.foldLeft(0.0) { (a, v) =>
          val w = v.toDouble / 1e6; a + w * w
        })
        // final 64 rows from the exact integers; the 6-dp round stays
        // in-engine so its shape is identical to the oracle's
        s2arr.zipWithIndex.toSeq
          .map { case (v, i) => (i + 1L, v) }
          .toDF("dim", "s2")
          .select($"dim", $"s2",
            round($"s2" / 1e6 / lit(n2), 6).as("u"))
          .orderBy($"dim")
      },
      Some("""WITH e AS (SELECT vec_id,
             |  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |ds AS (SELECT unnest(generate_series(1, 64)) AS dim),
             |i1 AS (SELECT ds.dim,
             |  sum(CAST(round(e.v[CAST(ds.dim AS INT)] * e.v[1]
             |    * 1e6) AS BIGINT)) AS s
             |  FROM e, ds GROUP BY ds.dim),
             |u1n AS (SELECT sqrt(list_sum(list_transform(
             |    list(s / 1e6 ORDER BY dim), x -> x * x))) AS n1,
             |  list(s / 1e6 ORDER BY dim) AS w1 FROM i1),
             |u1 AS (SELECT list_transform(w1, x -> x / n1) AS u
             |       FROM u1n),
             |dots AS (SELECT e.vec_id, e.v,
             |  list_sum(list_transform(generate_series(1, 64), k ->
             |    e.v[CAST(k AS INT)] * u1.u[CAST(k AS INT)])) AS dot
             |  FROM e, u1),
             |i2 AS (SELECT ds.dim,
             |  sum(CAST(round(dots.v[CAST(ds.dim AS INT)] * dots.dot
             |    * 1e6) AS BIGINT)) AS s2
             |  FROM dots, ds GROUP BY ds.dim),
             |n2 AS (SELECT sqrt(list_sum(list_transform(
             |    list(s2 / 1e6 ORDER BY dim), x -> x * x))) AS n2
             |  FROM i2)
             |SELECT CAST(i2.dim AS BIGINT) AS dim,
             |  CAST(i2.s2 AS BIGINT) AS s2,
             |  round(i2.s2 / 1e6 / n2.n2, 6) AS u
             |FROM i2, n2 ORDER BY dim""".stripMargin)),

    // ---- q185: Gini coefficient of the token-budget distribution —
    // the single-number inequality complement to q165's full Pareto
    // curve (how concentrated is the corpus in its longest docs).
    // Grouped closed form over the distinct token-count histogram:
    // 2Σ(rank·x) expands per value-run to v·(2·c·C + c·(c+1)), all
    // BIGINT until the final two-term double expression ----
    Q("q185_gini_tokens",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val g = T(s, d, "documents")
          .select(size(TextFunctions.tokens($"text")).cast("long")
            .as("tc"))
          .groupBy($"tc").agg(count(lit(1)).as("c"))
        val w = Window.orderBy($"tc")
          .rowsBetween(Window.unboundedPreceding, -1)
        val r = g.withColumn("cb", coalesce(sum($"c").over(w), lit(0L)))
          .agg(sum($"c").as("n"), sum($"tc" * $"c").as("t"),
            sum($"tc" * ($"c" * $"cb" * 2 + $"c" * ($"c" + 1)))
              .as("s2"))
        r.select($"n".as("n_docs"), $"t".as("n_tokens"),
          round($"s2".cast("double") /
            ($"n".cast("double") * $"t") -
            ($"n" + 1).cast("double") / $"n", 6).as("gini"))
      },
      Some(s"""WITH tcs AS (SELECT CAST(len($dTokens) AS BIGINT)
              |    AS tc FROM documents),
              |g AS (SELECT tc, count(*) AS c FROM tcs GROUP BY tc),
              |cu AS (SELECT tc, c,
              |  coalesce(sum(c) OVER (ORDER BY tc
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    0) AS cb
              |  FROM g),
              |a AS (SELECT sum(c) AS n, sum(tc * c) AS t,
              |  sum(tc * (c * cb * 2 + c * (c + 1))) AS s2 FROM cu)
              |SELECT CAST(n AS BIGINT) AS n_docs,
              |  CAST(t AS BIGINT) AS n_tokens,
              |  round(CAST(s2 AS DOUBLE) /
              |    (CAST(n AS DOUBLE) * t) -
              |    CAST(n + 1 AS DOUBLE) / n, 6) AS gini
              |FROM a""".stripMargin)),

    // ---- q193: EXACT set-similarity self-join by prefix filtering
    // (the PPJoin family) — the deterministic alternative to LSH
    // (q25/q27): no probabilistic misses, no banding parameters.
    // Tokens rank rarest-first by global df; a pair with Jaccard >= t
    // MUST share a token in each side's (n - ceil(t*n) + 1)-prefix,
    // so candidates come from tiny rare-token buckets plus a length
    // band (|a|/|b| within t), then verify runs the codegen'd
    // sorted-merge kernel. Both engines apply the IDENTICAL candidate
    // rule, so the gate is value-exact end to end ----
    Q("q193_prefix_filter_join",
      (s, d) => {
        import s.implicits._
        // 4-char-gram shingle hash sets: a realistic set domain
        // (word-level prefixes degenerate on this corpus's 31-word
        // vocab — every "rare" token still hits 1000s of docs and the
        // candidate join measured 66s; hashes make rarity real)
        // persist (r16): the 4-gram shingle kernel fed FOUR subtrees
        // (df-rank, rank-join, and both verify sides) — 4 serial
        // single-task kernel passes (~8 s of the row's cost, JobProbe
        // bench/r16). One pass, cached; MEMORY_AND_DISK spills rather
        // than OOMs at corpus scale (production stages this artifact
        // to disk, as the Dedup staged builders do). NOT widened:
        // paired A/B measured widen 0.86x here — with the persist the
        // kernel runs once, and the extra exchange costs more than one
        // pass's parallelism buys.
        val sh0 = T(s, d, "documents")
          .select($"doc_id",
            TextFunctions.ngramShingleHashes($"text", 4).as("hs"))
          .where(size($"hs") > 0)
        // SPARK_GRAFT_Q193_PERSIST=0 restores the recompute-per-subtree
        // shape (dev A/B lever)
        val sh =
          if (sys.env.get("SPARK_GRAFT_Q193_PERSIST").contains("0")) sh0
          else sh0.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dfr = sh.select($"doc_id", explode($"hs").as("h"))
          .groupBy($"h").agg(count(lit(1)).as("df"))
        val ranked = sh.select($"doc_id", explode($"hs").as("h"))
          .join(dfr, "h")
          .groupBy($"doc_id")
          .agg(sort_array(collect_list(struct($"df", $"h")))
            .as("rw"), count(lit(1)).as("n"))
          .select($"doc_id", $"n",
            expr("transform(rw, x -> x.h)").as("rs"))
        // prefix explode KEEPS each token's 1-based rank position px
        // (positions in the sliced prefix equal positions in the full
        // ranked list) for the positional filter below
        val pre = ranked.select($"doc_id", $"n",
          posexplode(expr(
            "slice(rs, 1, CAST(n - ((4 * n + 4) div 5) + 1 AS INT))")))
          .select($"doc_id", $"n", ($"pos" + 1).cast("long").as("px"),
            $"col".as("h"))
        // cap-exact bucket truncation (the q25/q105 guardrail): each
        // prefix-hash bucket keeps its maxBucket smallest doc_ids,
        // mirrored by the oracle's row_number rule — degenerate
        // boilerplate grams can't go quadratic at any SF
        val cap = Dedup.DefaultMaxBucket
        val buck = pre.groupBy($"h")
          .agg(sort_array(collect_list(struct($"doc_id", $"n", $"px")))
            .as("ms"))
          .select($"h", explode(slice($"ms", 1, cap)).as("m"))
          .select($"h", $"m.doc_id".as("doc_id"), $"m.n".as("n"),
            $"m.px".as("px"))
        // PPJoin positional filter (EXACT, no recall loss): J >= 4/5
        // needs overlap >= ceil(4(nx+ny)/9), and at a shared token at
        // ranks (px, py) the overlap is bounded by 1 + the shorter
        // remaining suffix. A true pair's FIRST shared prefix token
        // always passes this bound, so OR-ing across shared tokens
        // (the distinct below) keeps recall exact while pruning the
        // deep-prefix collisions that dominated candidate volume
        // (sf1: 55.2M -> measured below; the oracle applies the
        // identical integer rule)
        val cand = buck.as("x").join(buck.as("y"),
            col("x.h") === col("y.h") &&
              col("x.doc_id") < col("y.doc_id") &&
              col("x.n") * 4 <= col("y.n") * 5 &&
              col("y.n") * 4 <= col("x.n") * 5 &&
              expr("1 + least(x.n - x.px, y.n - y.px) >= " +
                "(4 * (x.n + y.n) + 8) div 9"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct()
        val js = sh.select($"doc_id", $"hs")
        // width-aware gate: hashed shingles materialize ~32x their
        // parquet-bytes estimate (Dedup.ShingleBytesAmplification).
        // Deliberately NOT the SHUFFLE_HASH fallback verifyCandidates
        // uses: q193's cost is candidate GENERATION (the bucketed
        // self-join + distinct), not the verify join, and the r13
        // post-fix A/B measured the hint a wash at sf10 (612.8 vs
        // 550.2 s) and a 2.4x LOSS at sf1 (65.9 vs 157.7 s) — the
        // un-hinted plan stays (slope 9.3x/decade, corpus-linear)
        val hinted: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame =
          if (Dedup.shingleBroadcastable(js)) broadcast(_) else identity
        cand
          .join(hinted(js.select($"doc_id".as("a"), $"hs".as("ja"))),
            Seq("a"))
          .join(hinted(js.select($"doc_id".as("b"), $"hs".as("jb"))),
            Seq("b"))
          // threshold-aware kernel: early merge exit once the pair
          // provably can't round to >= 0.8; survivors carry values
          // identical to jaccard_sorted (oracle unchanged)
          .select($"a", $"b",
            round(call_function("jaccard_ge_sorted", $"ja", $"jb",
              lit(0.8)), 6).as("jaccard"))
          .where($"jaccard" >= 0.8)
          .orderBy($"a", $"b")
      },
      Some(s"""WITH t AS (SELECT doc_id, ${dShinglesN(4)} AS ts
              |  FROM documents),
              |t2 AS (SELECT doc_id, ts FROM t WHERE len(ts) > 0),
              |e AS (SELECT doc_id, unnest(ts) AS h FROM t2),
              |df AS (SELECT h, count(*) AS df FROM e GROUP BY h),
              |rw AS (SELECT e.doc_id,
              |    list(e.h ORDER BY df.df, e.h) AS rs,
              |    count(*) AS n
              |  FROM e JOIN df USING (h) GROUP BY e.doc_id),
              |pre AS (SELECT doc_id, n,
              |    unnest(rs[1 : CAST(n - ((4 * n + 4) // 5) + 1
              |                   AS INT)]) AS h,
              |    generate_subscripts(rs[1 : CAST(n - ((4 * n + 4)
              |                   // 5) + 1 AS INT)], 1) AS px
              |  FROM rw),
              |buck AS (SELECT h, doc_id, n, px FROM (
              |  SELECT h, doc_id, n, px, row_number() OVER (
              |    PARTITION BY h ORDER BY doc_id) AS rk
              |  FROM pre) WHERE rk <= ${Dedup.DefaultMaxBucket}),
              |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              |  FROM buck x JOIN buck y ON x.h = y.h
              |    AND x.doc_id < y.doc_id
              |    AND x.n * 4 <= y.n * 5 AND y.n * 4 <= x.n * 5
              |    AND 1 + least(x.n - x.px, y.n - y.px) >=
              |        (4 * (x.n + y.n) + 8) // 9),
              |js AS (SELECT doc_id, ts, len(ts) AS n FROM t2),
              |sc AS (SELECT c.a, c.b,
              |    xa.n + xb.n AS st,
              |    len(list_distinct(list_concat(xa.ts, xb.ts)))
              |      AS un
              |  FROM cand c JOIN js xa ON xa.doc_id = c.a
              |             JOIN js xb ON xb.doc_id = c.b)
              |SELECT a, b,
              |  round(CAST(st - un AS DOUBLE) / un, 6) AS jaccard
              |FROM sc
              |WHERE round(CAST(st - un AS DOUBLE) / un, 6) >= 0.8
              |ORDER BY a, b""".stripMargin)),

    // ---- q194: per-source distinctive-token signatures by
    // chi-square — "what vocabulary characterizes this feed" (the
    // drift/contamination fingerprint that reads better than raw
    // counts). Doc-frequency 2x2 contingency per (source, token),
    // the chi2 closed form in one identical double expression
    // (products stay in exact BIGINT range before the one double
    // squaring), top-5 per source via the WindowGroupLimit rank ----
    Q("q194_source_signatures",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = T(s, d, "documents")
          .select($"doc_id", $"source",
            array_distinct(TextFunctions.tokens($"text")).as("ts"))
        val dt = docs.select($"source", $"doc_id",
          explode($"ts").as("w"))
        val bySrc = dt.groupBy($"source", $"w")
          .agg(count(lit(1)).as("a"))
        val nSrc = docs.groupBy($"source")
          .agg(count(lit(1)).as("n_src"))
        val byTok = dt.groupBy($"w").agg(count(lit(1)).as("n_tok"))
        val nTot = docs.agg(count(lit(1)).as("n_tot"))
        val scored = bySrc.join(broadcast(nSrc), "source")
          .join(broadcast(byTok), "w")
          .crossJoin(broadcast(nTot))
          // a token present in EVERY doc has no discriminative power
          // and a zero (b+d) margin — excluded, not divided by
          .where($"n_tok" < $"n_tot")
          .withColumn("b", $"n_src" - $"a")
          .withColumn("c", $"n_tok" - $"a")
          .withColumn("dd", $"n_tot" - $"n_src" - $"c")
          // a single-source corpus zeroes the (c+dd) margin: chi2
          // undefined -> NULL on BOTH engines (DuckDB /0 is NULL)
          .withColumn("chi2",
            when($"n_tot" === $"n_src", lit(null).cast("double"))
              .otherwise(round($"n_tot".cast("double") *
                ($"a" * $"dd" - $"b" * $"c").cast("double") *
                ($"a" * $"dd" - $"b" * $"c").cast("double") /
                (($"a" + $"b").cast("double") * ($"c" + $"dd") *
                  ($"a" + $"c") * ($"b" + $"dd")), 4)))
        val w = Window.partitionBy($"source")
          .orderBy($"chi2".desc, $"w")
        scored.withColumn("rk", row_number().over(w).cast("long"))
          .where($"rk" <= 5)
          .select($"source", $"rk", $"w".as("token"), $"a", $"chi2")
          .orderBy($"source", $"rk")
      },
      Some(s"""WITH docs AS (SELECT doc_id, source,
              |    list_distinct($dTokens) AS ts FROM documents),
              |dt AS (SELECT source, doc_id, unnest(ts) AS w
              |       FROM docs),
              |bs AS (SELECT source, w, count(*) AS a FROM dt
              |       GROUP BY source, w),
              |ns AS (SELECT source, count(*) AS n_src FROM docs
              |       GROUP BY source),
              |ntk AS (SELECT w, count(*) AS n_tok FROM dt
              |        GROUP BY w),
              |nt AS (SELECT count(*) AS n_tot FROM docs),
              |sc AS (SELECT bs.source, bs.w, bs.a,
              |  ns.n_src - bs.a AS b, ntk.n_tok - bs.a AS c,
              |  nt.n_tot - ns.n_src - (ntk.n_tok - bs.a) AS dd,
              |  nt.n_tot AS n_tot
              |  FROM bs JOIN ns USING (source)
              |          JOIN ntk USING (w), nt
              |  WHERE ntk.n_tok < nt.n_tot),
              |ch AS (SELECT source, w, a,
              |  round(CAST(n_tot AS DOUBLE) *
              |    CAST(a * dd - b * c AS DOUBLE) *
              |    CAST(a * dd - b * c AS DOUBLE) /
              |    (CAST(a + b AS DOUBLE) * (c + dd) * (a + c)
              |     * (b + dd)), 4) AS chi2
              |  FROM sc),
              |r AS (SELECT source, w, a, chi2,
              |  CAST(row_number() OVER (PARTITION BY source
              |    ORDER BY chi2 DESC, w) AS BIGINT) AS rk
              |  FROM ch)
              |SELECT source, rk, w AS token, CAST(a AS BIGINT) AS a,
              |  chi2
              |FROM r WHERE rk <= 5 ORDER BY source, rk"""
        .stripMargin)),

    // ---- q198: DSIR-style importance selection (round 10). Hashed
    // n-gram importance resampling (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): featurize each
    // doc as hashed unigram+bigram counts (B=512 buckets, the q140
    // hashing trick — no vocabulary to build, broadcast, or version),
    // estimate the TARGET feature distribution from an in-corpus
    // exemplar slice (source = 'src0') and the RAW distribution from
    // the whole corpus, weight each doc by its add-half-smoothed
    // feature-frequency ratio evidence, keep the top 50. Linear ratio
    // instead of the paper's log-ratio for the q82 reason: + - * / are
    // correctly-rounded IEEE and engine-identical while libm log is
    // not; the selector only needs monotone per-feature evidence.
    // Scale: the gram stream is one explode (map-side); per-doc and
    // per-feature counts are hash-aggs; the ratio table is <= B rows
    // — Aggregate-bounded, so its broadcast is cardinality-safe at
    // any corpus size; top-50 is TakeOrderedAndProject, never a
    // global sort. Contribs are 6dp-rounded and summed through
    // DECIMAL so fold order cannot change the float ----
    Q("q198_dsir_select",
      (s, d) => {
        import s.implicits._
        val B = 512
        val docs = T(s, d, "documents")
        // widen: tokenize is the corpus-linear kernel here (r16)
        val toks = graft.ops.ScanParallelism.widen(docs)
          .select($"doc_id", $"source",
            TextFunctions.tokens($"text").as("t"))
        // ONE scan, ONE explode: unigrams and bigrams concatenated per
        // row (the native ngram_join kernel — an interpreted
        // zip_with/slice formulation measured 4x the tokenize cost on
        // the q110 gram stream, and a union of two selects re-scanned
        // and re-tokenized the text column twice)
        val grams = toks.select($"doc_id", $"source",
          explode(concat($"t",
            TextFunctions.bigramsFromTokens($"t"))).as("g"))
          .select($"doc_id", $"source",
            (TextFunctions.tokenHash32($"g") % B).cast("long").as("f"))
        // ONE hash-agg over the exploded stream; every downstream
        // aggregate (per-feature raw/target counts, corpus-wide
        // normalizers) derives from this much smaller relation, so
        // Spark's exchange reuse shares the single gram shuffle
        val c0 = grams.groupBy($"doc_id", $"source", $"f")
          .agg(count(lit(1)).as("c"))
        val c = c0.select($"doc_id", $"f", $"c")
        val raw = c0.groupBy($"f").agg(sum($"c").as("cr"))
        val tgt = c0.where($"source" === "src0")
          .groupBy($"f").agg(sum($"c").as("ct"))
        // corpus-wide normalizers as a 1-row scalar aggregate —
        // crossJoin(broadcast) keeps the whole thing one DAG (no
        // driver action), the q139 pattern
        val totals = c0.agg(sum($"c").as("rn"),
          sum(when($"source" === "src0", $"c").otherwise(0L)).as("tn"))
        val half = lit(B.toDouble / 2.0)
        val ratio = raw.join(tgt, Seq("f"), "left")
          .crossJoin(broadcast(totals))
          .select($"f", round(
            ((coalesce($"ct", lit(0L)).cast("double") + lit(0.5)) *
              ($"rn".cast("double") + half)) /
              (($"cr".cast("double") + lit(0.5)) *
                ($"tn".cast("double") + half)), 6).as("r6"))
        c.join(broadcast(ratio), "f")
          .select($"doc_id",
            round($"c".cast("double") * $"r6", 6)
              .cast("decimal(18,6)").as("contrib"))
          .groupBy($"doc_id")
          .agg(sum($"contrib").cast("double").as("score"))
          // inner join = the selection POOL is docs with at least one
          // gram: a zero-token doc has no evidence either way and can
          // never be importance-selected (intended; oracle mirrors it)
          .join(docs.select($"doc_id", $"source"), "doc_id")
          .select($"doc_id", $"source", $"score")
          .orderBy($"score".desc, $"doc_id".asc)
          .limit(50)
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, $dTokens AS t
              |             FROM documents),
              |uni AS (SELECT doc_id, source, unnest(t) AS g FROM toks),
              |bi AS (SELECT doc_id, source, unnest(list_transform(
              |    generate_series(1, len(t) - 1),
              |    i -> t[CAST(i AS INT)] || ' ' ||
              |         t[CAST(i AS INT) + 1])) AS g
              |  FROM toks WHERE len(t) >= 2),
              |grams AS (SELECT doc_id, source,
              |    CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
              |      % 512 AS f
              |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
              |c AS (SELECT doc_id, f, count(*) AS c FROM grams
              |      GROUP BY 1, 2),
              |raw AS (SELECT f, count(*) AS cr FROM grams GROUP BY f),
              |tgt AS (SELECT f, count(*) AS ct FROM grams
              |        WHERE source = 'src0' GROUP BY f),
              |tots AS (SELECT CAST(count(*) AS DOUBLE) AS rn,
              |    CAST(count(*) FILTER (WHERE source = 'src0')
              |      AS DOUBLE) AS tn
              |  FROM grams),
              |ratio AS (SELECT raw.f, round(
              |    ((coalesce(ct, 0) + 0.5) * (rn + 256.0)) /
              |    ((cr + 0.5) * (tn + 256.0)), 6) AS r6
              |  FROM raw LEFT JOIN tgt ON raw.f = tgt.f, tots),
              |sc AS (SELECT c.doc_id, CAST(sum(CAST(
              |      round(CAST(c.c AS DOUBLE) * r6, 6)
              |      AS DECIMAL(18,6))) AS DOUBLE) AS score
              |  FROM c JOIN ratio ON c.f = ratio.f GROUP BY 1)
              |SELECT sc.doc_id, d.source, sc.score
              |FROM sc JOIN documents d ON sc.doc_id = d.doc_id
              |ORDER BY score DESC, sc.doc_id LIMIT 50""".stripMargin)),

    // ---- q199: deterministic epoch shuffle + byte-balanced shard
    // assignment (round 10). The training-loader ordering problem:
    // every epoch must visit the corpus in a DIFFERENT pseudo-random
    // order, reproducible across reruns and engines, without ever
    // materializing a global sort of the corpus. Order key = md5 of
    // (epoch ':' doc_id) — a seeded permutation per epoch; shard = the
    // doc's byte-offset quantile in that order, via the q72 two-phase
    // prefix scan (per-range-partition sums collected once — <=
    // shuffle-partition rows — offsets broadcast back; never a global
    // window). Shards balance BYTES, not doc counts, so no trainer
    // node drags the epoch. Output is the per-(epoch, shard) loader
    // manifest. Scale: two range exchanges over (hash, n_chars) —
    // the TEXT column is pruned at the scan ----
    Q("q199_epoch_shuffle",
      (s, d) => {
        import s.implicits._
        val S = 8
        val docs = T(s, d, "documents")
        // 1-row scalar aggregate joined in as a broadcast — the q139
        // pattern: keeps the whole query one DAG (no blocking driver
        // action before the main job). coalesce: sum of zero rows is
        // NULL, not 0; the greatest(1) floor keeps the div total-safe
        val tot = docs.agg(greatest(
          coalesce(sum($"n_chars".cast("long")), lit(0L)), lit(1L))
          .as("tot"))
        def epochStarts(e: Int) =
          Curate.tokenStarts(
            docs.select(
              md5(concat(lit(s"$e:"), $"doc_id".cast("string"))).as("h"),
              $"n_chars"),
            "h", $"n_chars")
            .select(lit(e.toLong).as("epoch"), $"tok", $"start")
        epochStarts(0).unionByName(epochStarts(1))
          .crossJoin(broadcast(tot))
          .withColumn("shard",
            expr(s"least(${S - 1}L, (start * $S) div tot)"))
          .drop("tot")
          .groupBy($"epoch", $"shard")
          .agg(count(lit(1)).as("n_docs"), sum($"tok").as("chars"))
          .orderBy($"epoch", $"shard")
      },
      Some("""WITH ep AS (SELECT 0 AS epoch UNION ALL SELECT 1),
             |k AS (SELECT epoch, doc_id, n_chars,
             |    md5(CAST(epoch AS VARCHAR) || ':' ||
             |        CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents, ep),
             |p AS (SELECT epoch, n_chars,
             |    coalesce(sum(CAST(n_chars AS BIGINT)) OVER (
             |      PARTITION BY epoch ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0) AS start
             |  FROM k),
             |t AS (SELECT greatest(CAST(coalesce(sum(n_chars), 0) AS BIGINT), 1)
             |        AS tot FROM documents),
             |sh AS (SELECT epoch,
             |    least(7, (start * 8) // tot) AS shard, n_chars
             |  FROM p, t)
             |SELECT CAST(epoch AS BIGINT) AS epoch,
             |  CAST(shard AS BIGINT) AS shard,
             |  count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM sh GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q200: scale-safe SimHash near-dup pairs (round 11). q41's
    // 4x16-bit banding has a FIXED 262144-key space: buckets grow
    // linearly with the corpus and capped candidate pairs
    // quadratically until truncation (the r10 verdict's one `weak`,
    // 11.3x measured wall slope). This variant is the published
    // block-permutation scheme (Manku et al., WWW 2007): 6 blocks,
    // C(6,3)=20 block-triple bands with ~2^32-key space each — recall
    // for Hamming distance <= 3 is the same pigeonhole guarantee, but
    // buckets stay O(true duplicates) at any corpus size — plus an
    // EXACT Hamming verify (xor + bit_count on 32-bit halves,
    // codegen'd builtins), so output grows with the true near-dup
    // mass. Scale: one banding shuffle (20n rows of ~32-bit keys) +
    // candidate-linear verify ----
    Q("q200_simhash_scalable",
      (s, d) => {
        import s.implicits._
        Dedup.simhashNearDupPairs(T(s, d, "documents"), "text",
          "doc_id", maxHamming = 3).orderBy($"a", $"b")
      },
      Some {
        val comboSelects = Dedup.SimhashCombos.zipWithIndex
          .map { case (c, ci) =>
            val key = c.map { i =>
              val (off, len) = Dedup.SimhashBlocks(i)
              s"substr(sh, $off, $len)"
            }.mkString(" || ")
            s"  SELECT doc_id, $ci AS band, $key AS bkey FROM sk"
          }.mkString("\nUNION ALL\n")
        s"""WITH hs AS (SELECT doc_id,
           |  list_transform($dTokens, t -> md5(t)) AS h
           |  FROM documents),
           |sk AS (SELECT doc_id, $dSimhashExpr AS sh FROM hs),
           |bands AS (
           |$comboSelects),
           |rkd AS (
           |  SELECT doc_id, band, bkey,
           |         row_number() OVER (PARTITION BY band, bkey
           |                            ORDER BY doc_id) AS rk
           |  FROM bands),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |  FROM rkd x JOIN rkd y
           |    ON x.band = y.band AND x.bkey = y.bkey
           |   AND x.doc_id < y.doc_id
           |   AND x.rk <= $dMaxBucket AND y.rk <= $dMaxBucket),
           |ham AS (
           |  SELECT c.a, c.b,
           |    CAST(64 - list_sum(list_transform(generate_series(1, 64),
           |      i -> CASE WHEN sx.sh[CAST(i AS INT):CAST(i AS INT)] =
           |                      sy.sh[CAST(i AS INT):CAST(i AS INT)]
           |           THEN 1 ELSE 0 END)) AS INT) AS hamming
           |  FROM cand c JOIN sk sx ON sx.doc_id = c.a
           |              JOIN sk sy ON sy.doc_id = c.b)
           |SELECT a, b, hamming FROM ham
           |WHERE hamming <= 3 ORDER BY a, b""".stripMargin
      },
      bench = true),

    // ---- q201: plane-count-scaled embedding near-dup (round 11).
    // q42's 8 hyperplanes are a FIXED 256-key signature space — the
    // r11 sf10 window measured bucket fill growing linearly with the
    // corpus and capped candidates quadratically (53x decade slope,
    // the q41 disease in vector clothing; README §BENCH_r11). The
    // production rule is planes ≈ log2(N / target_bucket): this
    // variant runs the SAME pipeline at 16 planes (65536 keys), so
    // expected bucket fill at any measured SF stays O(N/65536) and
    // candidate volume tracks true near-neighbor mass, not key-space
    // saturation. Recall tightens with plane count by design (a
    // signature is an exact-match band); the threshold verify is
    // unchanged and the oracle mirrors the 16-plane matrix literally.
    // Scale: one shuffle on the signature + candidate-linear verify
    // with the gated vector join-back (q42's r11 rewrite).
    // The corpus is SEEDED with one exact duplicate (vec_id 0's vector
    // re-inserted as vec_id -1) so the oracle row is non-vacuous at
    // every SF — 16 planes over the driver's ~500-vector sf0.01 emit
    // an empty candidate set otherwise, and a 0 == 0 pass proves only
    // the empty case (r11 verdict What's-wrong #3) ----
    Q("q201_embedding_neardup_scaled",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings").select($"vec_id", $"embedding")
        val seeded = emb.unionByName(emb.where($"vec_id" === 0L)
          .select(lit(-1L).as("vec_id"), $"embedding"))
        Similarity.embeddingNearDuplicates(seeded,
          "embedding", "vec_id", dim = 64, threshold = 0.25,
          planes = 16)
          .orderBy($"a", $"b")
      },
      Some {
        val m = Similarity.planeMatrix(16, 64)
        val mLit = m.map(_.mkString("[", ", ", "]"))
          .mkString("[", ",\n    ", "]")
        s"""WITH emb2 AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT CAST(-1 AS BIGINT), embedding FROM embeddings
           |  WHERE vec_id = 0),
           |pm AS (SELECT $mLit AS m),
           |sig AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |    array_to_string(
           |    list_transform(generate_series(1, 16), p ->
           |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
           |        j -> CAST(embedding[CAST(j AS INT)] AS DOUBLE)
           |             * m[CAST(p AS INT)][CAST(j AS INT)])) >= 0
           |      THEN '1' ELSE '0' END), '') AS sig
           |  FROM emb2, pm),
           |rkd AS (
           |  SELECT vec_id, v, sig,
           |         row_number() OVER (PARTITION BY sig
           |                            ORDER BY vec_id) AS rk
           |  FROM sig),
           |cand AS (
           |  SELECT x.vec_id AS a, y.vec_id AS b, x.v AS va, y.v AS vb
           |  FROM rkd x JOIN rkd y
           |    ON x.sig = y.sig AND x.vec_id < y.vec_id
           |   AND x.rk <= 10000 AND y.rk <= 10000),
           |sc AS (
           |  SELECT a, b,
           |    list_sum(list_transform(generate_series(1, 64), j ->
           |      va[CAST(j AS INT)] * vb[CAST(j AS INT)])) AS dt,
           |    sqrt(list_sum(list_transform(va, x -> x * x))) AS na,
           |    sqrt(list_sum(list_transform(vb, x -> x * x))) AS nb
           |  FROM cand)
           |SELECT a, b,
           |  round(CASE WHEN na = 0 OR nb = 0 THEN 0
           |        ELSE dt / (na * nb) END, 6) AS score
           |FROM sc
           |WHERE round(CASE WHEN na = 0 OR nb = 0 THEN 0
           |      ELSE dt / (na * nb) END, 6) >= 0.25
           |ORDER BY a, b""".stripMargin
      },
      bench = true),

    // ---- q202: the embedding-near-dup DEFAULT path (round 12).
    // Calling Similarity.embeddingNearDuplicates WITHOUT a plane count
    // now auto-scales the signature width: planes = min p in [8,32]
    // with 2^p * 4 >= count(corpus) — integer arithmetic on both
    // engines, so no floating-log2 boundary divergence. This is the
    // r11 verdict's top prescription (the scale-killer 8-plane config
    // was the default a user actually got); q42 keeps the legacy
    // behavior at an EXPLICIT planes = 8. The oracle mirrors the rule
    // dynamically (min-p scalar subquery over a 32-row matrix literal
    // sliced by generate_series), so the row stays green at any SF
    // with the planes the engine actually picked. Seeded duplicate as
    // q201, so the row is non-vacuous at the driver's sf0.01 ----
    Q("q202_embedding_neardup_auto",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings").select($"vec_id", $"embedding")
        val seeded = emb.unionByName(emb.where($"vec_id" === 0L)
          .select(lit(-1L).as("vec_id"), $"embedding"))
        Similarity.embeddingNearDuplicates(seeded,
          "embedding", "vec_id", dim = 64, threshold = 0.25)
          .orderBy($"a", $"b")
      },
      Some {
        val m = Similarity.planeMatrix(32, 64)
        val mLit = m.map(_.mkString("[", ", ", "]"))
          .mkString("[", ",\n    ", "]")
        s"""WITH emb2 AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT CAST(-1 AS BIGINT), embedding FROM embeddings
           |  WHERE vec_id = 0),
           |np AS (SELECT CAST(coalesce(
           |  (SELECT min(p) FROM range(8, 33) t(p)
           |   WHERE power(2.0, p) * 4 >= (SELECT count(*) FROM emb2)),
           |  32) AS INT) AS planes),
           |pm AS (SELECT $mLit AS m),
           |sig AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |    array_to_string(
           |    list_transform(
           |      generate_series(1, (SELECT planes FROM np)), p ->
           |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
           |        j -> CAST(embedding[CAST(j AS INT)] AS DOUBLE)
           |             * m[CAST(p AS INT)][CAST(j AS INT)])) >= 0
           |      THEN '1' ELSE '0' END), '') AS sig
           |  FROM emb2, pm),
           |rkd AS (
           |  SELECT vec_id, v, sig,
           |         row_number() OVER (PARTITION BY sig
           |                            ORDER BY vec_id) AS rk
           |  FROM sig),
           |cand AS (
           |  SELECT x.vec_id AS a, y.vec_id AS b, x.v AS va, y.v AS vb
           |  FROM rkd x JOIN rkd y
           |    ON x.sig = y.sig AND x.vec_id < y.vec_id
           |   AND x.rk <= 10000 AND y.rk <= 10000),
           |sc AS (
           |  SELECT a, b,
           |    list_sum(list_transform(generate_series(1, 64), j ->
           |      va[CAST(j AS INT)] * vb[CAST(j AS INT)])) AS dt,
           |    sqrt(list_sum(list_transform(va, x -> x * x))) AS na,
           |    sqrt(list_sum(list_transform(vb, x -> x * x))) AS nb
           |  FROM cand)
           |SELECT a, b,
           |  round(CASE WHEN na = 0 OR nb = 0 THEN 0
           |        ELSE dt / (na * nb) END, 6) AS score
           |FROM sc
           |WHERE round(CASE WHEN na = 0 OR nb = 0 THEN 0
           |      ELSE dt / (na * nb) END, 6) >= 0.25
           |ORDER BY a, b""".stripMargin
      },
      bench = true),

    // ---- q203: the SimHash-candidate DEFAULT path (round 12).
    // Dedup.simhashCandidatePairs now defaults to the Manku
    // block-permutation banding (q200's candidate stage — 20
    // block-triple bands, ~2^32 keys each) instead of the saturating
    // 4x16 scheme, which moved behind the explicit
    // simhashCandidatePairs4x16 (q41). This row gates the new default
    // exactly as q41 gates the legacy one: candidates only, no verify
    // (q200 covers the verified path; not a bench row for the same
    // reason — the candidate stage is a strict subset of q200's
    // measured plan) ----
    Q("q203_simhash_candidates_default",
      (s, d) => {
        import s.implicits._
        Dedup.simhashCandidatePairs(T(s, d, "documents"), "text",
          "doc_id").orderBy($"a", $"b")
      },
      Some {
        val comboSelects = Dedup.SimhashCombos.zipWithIndex
          .map { case (c, ci) =>
            val key = c.map { i =>
              val (off, len) = Dedup.SimhashBlocks(i)
              s"substr(sh, $off, $len)"
            }.mkString(" || ")
            s"  SELECT doc_id, $ci AS band, $key AS bkey FROM sk"
          }.mkString("\nUNION ALL\n")
        s"""WITH hs AS (SELECT doc_id,
           |  list_transform($dTokens, t -> md5(t)) AS h
           |  FROM documents),
           |sk AS (SELECT doc_id, $dSimhashExpr AS sh FROM hs),
           |bands AS (
           |$comboSelects),
           |rkd AS (
           |  SELECT doc_id, band, bkey,
           |         row_number() OVER (PARTITION BY band, bkey
           |                            ORDER BY doc_id) AS rk
           |  FROM bands)
           |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |FROM rkd x JOIN rkd y
           |  ON x.band = y.band AND x.bkey = y.bkey
           | AND x.doc_id < y.doc_id
           | AND x.rk <= $dMaxBucket AND y.rk <= $dMaxBucket
           |ORDER BY a, b""".stripMargin
      }),

    // ---- q204: IVF-bucketed approximate kNN edges — the opt-in
    // 100 TB alternative to the exact anchor×corpus build (q92). Each
    // vector joins its nearest coarse centroid (q49's quantizer, same
    // 1-in-37 id-bounded codebook), each anchor probes its 4 nearest
    // cells, and scoring touches only the probed lists — one broadcast
    // hash join against the assigned corpus instead of a full scan,
    // then the same bounded top-k aggregate as q92 (no window, no sort
    // of scored rows). The oracle mirrors the PRUNING too, so the row
    // is exact even though the result is approximate-by-design
    // relative to q92's edge set ----
    Q("q204_ivf_knn_edges",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        Similarity.ivfKnnEdges(emb, 3)
          .select($"src", $"rank", $"dst", $"score")
          .orderBy($"src", $"rank")
      },
      Some("""WITH cents AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id % 37 = 0 AND vec_id < 5000),
             |pairs AS (
             |  SELECT e.vec_id, e.embedding, c.cidx,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      c.cv[CAST(j AS INT)]
             |      * CAST(e.embedding[CAST(j AS INT)] AS DOUBLE))) AS dt,
             |    sqrt(list_sum(list_transform(c.cv, x -> x * x))) AS nc,
             |    sqrt(list_sum(list_transform(e.embedding, x ->
             |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne
             |  FROM embeddings e, cents c),
             |assign AS (
             |  SELECT vec_id, embedding, cidx,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY
             |      (CASE WHEN nc = 0 OR ne = 0 THEN 0
             |            ELSE dt / (nc * ne) END) DESC, cidx ASC) AS rk
             |  FROM pairs),
             |a1 AS (
             |  SELECT vec_id, embedding, cidx FROM assign WHERE rk = 1),
             |anchors AS (
             |  SELECT vec_id AS src, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |aprobe AS (
             |  SELECT src, qv, cidx,
             |    row_number() OVER (PARTITION BY src ORDER BY
             |      (CASE WHEN nc = 0 OR nq = 0 THEN 0
             |            ELSE dt / (nc * nq) END) DESC, cidx ASC) AS rk
             |  FROM (
             |    SELECT a.src, a.qv, c.cidx,
             |      list_sum(list_transform(generate_series(1, 64), j ->
             |        c.cv[CAST(j AS INT)] * a.qv[CAST(j AS INT)])) AS dt,
             |      sqrt(list_sum(list_transform(c.cv, x -> x * x)))
             |        AS nc,
             |      sqrt(list_sum(list_transform(a.qv, x -> x * x)))
             |        AS nq
             |    FROM anchors a, cents c) p),
             |probed AS (SELECT src, qv, cidx FROM aprobe WHERE rk <= 4),
             |cand AS (
             |  SELECT p.src, p.qv, a1.vec_id AS dst, a1.embedding
             |  FROM a1 JOIN probed p USING (cidx)
             |  WHERE a1.vec_id <> p.src),
             |sc AS (
             |  SELECT src, dst,
             |    round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |          ELSE dt / (nv * nq) END, 6) AS score
             |  FROM (
             |    SELECT src, dst,
             |      list_sum(list_transform(generate_series(1, 64), j ->
             |        CAST(embedding[CAST(j AS INT)] AS DOUBLE)
             |        * qv[CAST(j AS INT)])) AS dt,
             |      sqrt(list_sum(list_transform(embedding, x ->
             |        CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
             |      sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |    FROM cand) s0)
             |SELECT src, rank, dst, score FROM (
             |  SELECT src, dst, score,
             |    CAST(row_number() OVER (PARTITION BY src
             |      ORDER BY score DESC, dst ASC) AS BIGINT) AS rank
             |  FROM sc)
             |WHERE rank <= 3 ORDER BY src, rank""".stripMargin),
      bench = true),

    // ---- q205: IVF kNN edges with the AUTO-SCALED coarse quantizer —
    // the documented large-corpus default (round 15). q204's codebook
    // is a CONSTANT ~135 cells at any SF, so its probed corpus
    // fraction (~nprobe/|C| ≈ 3%) never shrinks as the corpus grows;
    // real IVF sizes nlist ≈ √n. Similarity.autoNlist picks the
    // smallest c in [16, 4096] with c*c >= count(corpus) — integer
    // arithmetic on both engines (the autoPlanes/q202 promotion
    // pattern), the oracle mirrors the rule with a scalar min-subquery
    // over range(16, 4097) and derives the SAME 1-in-every centroid
    // predicate, so the row is exact at any SF while the probed
    // fraction falls as ~nprobe/√n. q204 keeps the fixed-parameter
    // surface for stability ----
    Q("q205_ivf_knn_auto",
      (s, d) => {
        import s.implicits._
        val emb = T(s, d, "embeddings")
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        Similarity.ivfKnnEdgesAuto(emb, 3)
          .select($"src", $"rank", $"dst", $"score")
          .orderBy($"src", $"rank")
      },
      Some("""WITH nl AS (
             |  SELECT CAST(coalesce(
             |    (SELECT min(c) FROM range(16, 4097) t(c)
             |     WHERE c * c >= (SELECT count(*) FROM embeddings)),
             |    4096) AS BIGINT) AS nlist),
             |ev AS (
             |  SELECT greatest(1, (SELECT count(*) FROM embeddings)
             |    // (SELECT nlist FROM nl)) AS every),
             |cents AS (
             |  SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
             |         CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings
             |  WHERE vec_id % (SELECT every FROM ev) = 0),
             |pairs AS (
             |  SELECT e.vec_id, e.embedding, c.cidx,
             |    list_sum(list_transform(generate_series(1, 64), j ->
             |      c.cv[CAST(j AS INT)]
             |      * CAST(e.embedding[CAST(j AS INT)] AS DOUBLE))) AS dt,
             |    sqrt(list_sum(list_transform(c.cv, x -> x * x))) AS nc,
             |    sqrt(list_sum(list_transform(e.embedding, x ->
             |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne
             |  FROM embeddings e, cents c),
             |assign AS (
             |  SELECT vec_id, embedding, cidx,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY
             |      (CASE WHEN nc = 0 OR ne = 0 THEN 0
             |            ELSE dt / (nc * ne) END) DESC, cidx ASC) AS rk
             |  FROM pairs),
             |a1 AS (
             |  SELECT vec_id, embedding, cidx FROM assign WHERE rk = 1),
             |anchors AS (
             |  SELECT vec_id AS src, CAST(embedding AS DOUBLE[]) AS qv
             |  FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 5000),
             |aprobe AS (
             |  SELECT src, qv, cidx,
             |    row_number() OVER (PARTITION BY src ORDER BY
             |      (CASE WHEN nc = 0 OR nq = 0 THEN 0
             |            ELSE dt / (nc * nq) END) DESC, cidx ASC) AS rk
             |  FROM (
             |    SELECT a.src, a.qv, c.cidx,
             |      list_sum(list_transform(generate_series(1, 64), j ->
             |        c.cv[CAST(j AS INT)] * a.qv[CAST(j AS INT)])) AS dt,
             |      sqrt(list_sum(list_transform(c.cv, x -> x * x)))
             |        AS nc,
             |      sqrt(list_sum(list_transform(a.qv, x -> x * x)))
             |        AS nq
             |    FROM anchors a, cents c) p),
             |probed AS (SELECT src, qv, cidx FROM aprobe WHERE rk <= 4),
             |cand AS (
             |  SELECT p.src, p.qv, a1.vec_id AS dst, a1.embedding
             |  FROM a1 JOIN probed p USING (cidx)
             |  WHERE a1.vec_id <> p.src),
             |sc AS (
             |  SELECT src, dst,
             |    round(CASE WHEN nv = 0 OR nq = 0 THEN 0
             |          ELSE dt / (nv * nq) END, 6) AS score
             |  FROM (
             |    SELECT src, dst,
             |      list_sum(list_transform(generate_series(1, 64), j ->
             |        CAST(embedding[CAST(j AS INT)] AS DOUBLE)
             |        * qv[CAST(j AS INT)])) AS dt,
             |      sqrt(list_sum(list_transform(embedding, x ->
             |        CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
             |      sqrt(list_sum(list_transform(qv, x -> x * x))) AS nq
             |    FROM cand) s0)
             |SELECT src, rank, dst, score FROM (
             |  SELECT src, dst, score,
             |    CAST(row_number() OVER (PARTITION BY src
             |      ORDER BY score DESC, dst ASC) AS BIGINT) AS rank
             |  FROM sc)
             |WHERE rank <= 3 ORDER BY src, rank""".stripMargin),
      bench = true)
  )
}
