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

  /** Seeded token hash: md5("<seed>:<token>"). Hex string; lexicographic
    * min over tokens is a valid min-hash (uniform over the hex space). */
  def seededHash(seed: Column, token: Column): Column =
    md5(concat(seed.cast("string"), lit(":"), token))

  /** MinHash signature: array of `n` hex-string minima, one per seed.
    * Computed entirely map-side (two nested HOFs) — zero shuffle.
    * Null iff the document has no tokens. */
  def minhashSignature(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(toks, t => seededHash(i, t))))
  }

  /** LSH band keys over a minhash signature: `bands` hashes, each over
    * `rows` consecutive signature entries. Docs sharing any band key are
    * candidate near-duplicates. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", slice(sig, b * rows + 1, lit(rows)))))

  /** 64-bit SimHash as a 64-char '0'/'1' string (string form keeps it
    * engine-portable; callers needing a LONG can conv() it).
    * Bit j comes from bit (j%4) of hex nibble (j/4) of each token's md5;
    * the bit is set iff the token-majority vote is non-negative. */
  def simhashBits(text: Column): Column = {
    val hs = transform(tokens(text), tk => md5(tk))
    concat_ws("", transform(sequence(lit(0), lit(63)), j => {
      val p = floor(j.cast("double") / 4.0).cast("int") // nibble index 0..15
      val k = (j % 4).cast("int")                       // bit within nibble
      val vote = aggregate(hs, lit(0), (acc, h) => {
        val nib = conv(h.substr(p + 1, lit(1)), 16, 10).cast("int")
        val bit = (floor(nib.cast("double") / pow(lit(2.0),
          k.cast("double"))).cast("int") % 2)
        acc + (bit * 2 - 1)
      })
      when(vote >= 0, "1").otherwise("0")
    }))
  }

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

  /** Jaccard similarity of two pre-distinct shingle arrays, computed
    * without an intersect primitive (portable): |A∩B| = |A|+|B|-|A∪B|. */
  def jaccard(a: Column, b: Column): Column = {
    val unionN = size(array_distinct(concat(a, b)))
    val interN = size(a) + size(b) - unionN
    when(unionN === 0, lit(0.0))
      .otherwise(interN.cast("double") / unionN.cast("double"))
  }

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
}
