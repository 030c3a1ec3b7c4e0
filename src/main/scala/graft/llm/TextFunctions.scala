package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators.
  *
  * Design rules (100 TB scale):
  *   - everything here is built from codegen'd Catalyst builtins and
  *     higher-order functions (transform/aggregate/filter) — no Scala UDFs,
  *     so whole-stage codegen spans stay wide and there is NO shuffle until
  *     an operator explicitly groups/joins;
  *   - hashing is md5-based so signatures are deterministic across engines,
  *     platforms and restarts (important for incremental dedup: re-running
  *     over new data must produce comparable signatures).
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empty-token-free. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** BPE-ish token count: runs of letters, runs of digits, runs of other
    * non-space symbols each count as one token (a cheap, deterministic
    * stand-in for subword tokenization). */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text,
      lit("""[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]+"""), lit(0)))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** Normalized form used for fingerprinting: lowercase, collapsed
    * whitespace, trimmed. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-content fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** MinHash modulus: 2^31 - 1 (Mersenne prime). Affine permutations
    * `(a*h + b) mod P` over one 32-bit md5-prefix hash per token replace
    * the old one-md5-per-(token,seed) scheme: 16x less hashing, and all
    * intermediates fit signed 64-bit on any engine (a,h < 2^31 so the
    * product is < 2^62 — no overflow divergence between Spark LONG and
    * DuckDB BIGINT). */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic permutation coefficients (a_i in [1,P), b_i in [0,P)).
    * Fixed LCG-style derivation so Spark plans and oracle SQL can both
    * inline identical literals. */
  def minhashCoeffs(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = (1103515245L * (2 * i + 1) + 12345L) % MinhashPrime
      val b = (1103515245L * (2 * i + 2) + 54321L) % MinhashPrime
      (if (a == 0L) 1L else a, b)
    }

  /** 32-bit token hash: first 8 hex chars of md5 as a LONG in [0, 2^32). */
  def tokenHash32(token: Column): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long")

  /** MinHash signature: array of `n` LONG minima. ONE md5 per token, a
    * single running-minima pass — the native [[graft.functions
    * .MinHashSignature]] expression inside whole-stage codegen; entirely
    * map-side, zero shuffle. Null iff the document has no tokens.
    * Requires [[graft.functions.GraftFunctions.register]] on the
    * session. */
  def minhashSignature(text: Column, n: Int): Column =
    call_function("minhash_signature", tokens(text), lit(n))

  /** LSH band keys over a minhash signature: `bands` hashes, each over
    * `rows` consecutive signature entries. Docs sharing any band key are
    * candidate near-duplicates. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column = {
    val sigS = transform(sig, v => v.cast("string"))
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", slice(sigS, b * rows + 1, lit(rows)))))
  }

  /** 64-bit SimHash as a 64-char '0'/'1' string (string form keeps it
    * engine-portable; callers needing a LONG can conv() it).
    * Bit j comes from bit (j%4) of hex nibble (j/4) of each token's md5;
    * the bit is set iff the token-majority vote is non-negative.
    * A zero-token document short-circuits to all-'0' (without this, an
    * empty vote vector would read 0 >= 0 per bit — divergent from SQL
    * engines where sum-of-empty is NULL).
    * Native [[graft.functions.SimHash64]] expression: one md5 per token,
    * one pass accumulating all 64 vote counters. Requires
    * [[graft.functions.GraftFunctions.register]] on the session. */
  def simhashBits(text: Column): Column =
    call_function("simhash64", tokens(text))

  /** Distinct character n-gram shingles of the normalized text, sorted
    * (sorted so set-compare is order-insensitive and deterministic). */
  def ngramShingles(text: Column, n: Int): Column = {
    val norm = normalize(text)
    when(length(norm) >= n,
      array_sort(array_distinct(
        transform(sequence(lit(1), length(norm) - (n - 1)),
          i => norm.substr(i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Hashed shingles: md5-48bit of each n-gram of the normalized text,
    * sorted distinct ARRAY<LONG> — the compact form for high-volume pair
    * verification (native [[graft.functions.NgramHash48]]: one JVM pass,
    * no intermediate string arrays). */
  def ngramShingleHashes(text: Column, n: Int): Column =
    call_function("ngram_hash48", normalize(text), lit(n))

  /** Jaccard similarity of two pre-SORTED, pre-distinct shingle arrays
    * (what [[ngramShingles]] emits): native linear-merge expression, no
    * per-pair hash-set allocation. Equals (|A|+|B|-|A∪B|)/|A∪B|; both
    * empty -> 0. Requires [[graft.functions.GraftFunctions.register]]. */
  def jaccard(a: Column, b: Column): Column =
    call_function("jaccard_sorted", a, b)

  /** Threshold-aware jaccard: exact value when it can round (6 dp) to
    * >= t, NULL (early merge exit) once provably below — the verify
    * kernel for thresholded candidate streams. */
  def jaccardGe(a: Column, b: Column, t: Double): Column =
    call_function("jaccard_ge_sorted", a, b, lit(t))

  // ------------------------------------------------------------ quality

  /** Stopword lists used by the language-ID heuristic. Tiny on purpose:
    * broadcast-free (inlined into the plan as literals). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that",
      "for", "was", "with", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "mit", "den", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour",
      "que", "des", "du"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "en",
      "por", "que", "del"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Heuristic quality score in [0,1]: rewards reasonable length and word
    * size, penalizes punctuation-heavy and shouty text. All arithmetic is
    * double with a final 6-dp round for cross-engine determinism. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = tokenCountWs(text).cast("double")
    val punct = (nChars - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double")
    val upper = (nChars - length(regexp_replace(text, "[A-Z]", "")))
      .cast("double")
    val avgWordLen = when(nWords > 0, nChars / nWords).otherwise(lit(0.0))
    val lenScore = least(nChars / lit(200.0), lit(1.0))
    val wordLenScore = when(avgWordLen >= 3 && avgWordLen <= 12, lit(1.0))
      .otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punct / greatest(nChars, lit(1.0))
      * lit(4.0), lit(1.0))
    val upperScore = lit(1.0) - least(upper / greatest(nChars, lit(1.0))
      * lit(2.0), lit(1.0))
    round((lenScore * 0.3 + wordLenScore * 0.2 + punctScore * 0.3 +
      upperScore * 0.2), 6)
  }

  /** Predicted language by stopword-hit argmax. Deterministic tiebreak:
    * preference order en > de > fr > es (first max in the coalesce chain
    * wins); zero hits everywhere -> 'und'. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = Seq("en", "de", "fr", "es")
      .map(l => l -> stopwordHits(toks, stopwords(l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und").otherwise(null): Column) {
      case (acc, (l, s)) => coalesce(acc, when(s === best, l))
    }
  }

  // ---- repetition signals (the Gopher/MassiveText quality rules:
  // heavily self-repetitive documents are boilerplate/spam and get
  // filtered before training). All map-side: array ops over the line/
  // token lists, no shuffle. NOTE: these Column helpers inline the
  // line-list subtree at every reference (fine standalone); in hot
  // plans stage docLines/array_distinct as projected columns first and
  // compute the fractions from the attributes — see q59's staged form
  // in LlmQueries. ----

  /** Non-empty trimmed lines of the document. */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Fraction of lines that are repeats of an earlier line
    * (0.0 for line-less docs). */
  def dupLineFrac(text: Column): Column = {
    val ls = docLines(text)
    val n = size(ls).cast("double")
    val d = size(array_distinct(ls)).cast("double")
    when(n > 0, round((n - d) / n, 6)).otherwise(lit(0.0))
  }

  /** Fraction of line CHARACTERS sitting in repeated lines — the
    * char-weighted variant (a doc whose one repeated line is huge is
    * worse than one repeating a short separator). */
  def dupLineCharFrac(text: Column): Column = {
    val ls = docLines(text)
    val tot = aggregate(ls, lit(0L), (a, l) => a + length(l)).cast("double")
    val dis = aggregate(array_distinct(ls), lit(0L),
      (a, l) => a + length(l)).cast("double")
    when(tot > 0, round((tot - dis) / tot, 6)).otherwise(lit(0.0))
  }

  /** Adjacent word-bigram list ("a b", "b c", ...); empty below 2
    * tokens. Native [[graft.functions.NgramJoin]] kernel — the
    * interpreted transform/concat_ws formulation re-evaluated its
    * lambda body per element (the q59/q60 hazard class; measured 4x
    * the tokenize cost on the q110 gram stream). Registration is the
    * caller's via GraftFunctions (Queries.T does it). */
  def bigramsFromTokens(toks: Column): Column =
    // coalesce preserves the old `when/otherwise` contract: NULL token
    // array -> empty bigram list, not NULL (size() consumers differ)
    coalesce(call_function("ngram_join", toks, lit(2)),
      array().cast("array<string>"))

  /** Convenience form over raw text; prefer staging `tokens` first in
    * hot plans (see [[bigramsFromTokens]]). */
  def wordBigrams(text: Column): Column = bigramsFromTokens(tokens(text))

  // ---- PII scrubbing ----------------------------------------------------
  // Patterns restricted to the regex subset with identical semantics in
  // Java's engine (Spark) and RE2 (DuckDB, and most scrubbing tools):
  // no backrefs, no lookaround, \d/\S/literal classes only.

  /** `local@domain.tld` mailbox pattern. */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** `http(s)://` URL up to whitespace. */
  val UrlPattern = """https?://[^\s]+"""

  /** International-format phone: `+` then 7..14 digits with optional
    * single spaces/dashes between them. Anchored on the `+` so plain
    * numbers in prose don't false-positive. */
  val PhonePattern = """\+\d(?:[ -]?\d){6,13}"""

  /** Count of pattern occurrences (non-overlapping). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Mask emails, then URLs, then phone numbers with typed placeholder
    * tokens. Email runs FIRST so a mailbox inside a URL query string is
    * typed as the more specific <EMAIL>; the URL pass then absorbs the
    * rest of the URL around the placeholder. Pure codegen'd
    * regexp_replace stack — zero shuffle, scales as a map stage. */
  def piiMask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      PhonePattern, "<PHONE>")

  // ---- staged doc-length artifact (BM25's shared intermediate) ----

  private final class StagedDir(build: () => String) {
    lazy val dir: String = build()
  }
  private val stagedDlDirs =
    scala.collection.concurrent.TrieMap[(String, String, String),
      StagedDir]()

  /** Per-doc whitespace token counts (`doc_id`, `dl`) materialized to
    * parquet ONCE per JVM per (cacheKey, textCol, idCol) and read back
    * by every consumer — the [[Dedup.stagedCandidatePairs]] staging
    * discipline applied to retrieval's corpus statistics. BM25 needs dl
    * three times per scorer (N, avgdl, then the per-doc score join) and
    * two suite queries (q82, q159) share the same scorer; an in-memory
    * `.persist()` here both re-tokenized per JVM-lifetime consumer and
    * pinned cached blocks until eviction pressure (the r12 advisor
    * finding). At 100 TB, doc-length is a per-corpus-snapshot artifact
    * computed once at ingest, exactly this shape.
    *
    * Same snapshot contract as the other staged artifacts: the memo
    * key folds a [[graft.SourceToken]] over the frame's backing files
    * into `cacheKey` (new content at the same path => cold rebuild);
    * a build that throws deletes its half-written dir and leaves the
    * slot retryable. */
  def stagedDocLengths(docs: org.apache.spark.sql.DataFrame,
                       textCol: String, idCol: String,
                       cacheKey: String)
  : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    val key = s"$cacheKey#${graft.SourceToken.of(docs)}"
    val dir = stagedDlDirs.getOrElseUpdate((key, textCol, idCol),
      new StagedDir(() => {
        graft.StageTripwire.coldBuild(graft.StageTripwire.Bm25Dl)
        val tmp = graft.TempDirs.create("graft-bm25-dl")
        try {
          docs.select(col(idCol).as("doc_id"),
              tokenCountWs(col(textCol)).cast("long").as("dl"))
            .write.mode("overwrite").parquet(tmp)
          tmp
        } catch { case e: Throwable =>
          graft.TempDirs.deleteNow(tmp); throw e
        }
      })).dir
    // explicit schema: an empty corpus writes no files and inference
    // would fail on read-back
    s.read.schema("doc_id BIGINT, dl BIGINT").parquet(dir)
  }
}
