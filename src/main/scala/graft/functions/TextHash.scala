package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop implementations behind the text-hash Catalyst expressions.
  * All md5-based so results are deterministic across engines and bit-for-
  * bit reproducible by the DuckDB oracles (same algorithms as the
  * documented SQL mirrors in [[graft.llm.LlmQueries]]).
  *
  * Static-forwarded (plain object, no companion class) so generated
  * whole-stage code can call `graft.functions.TextHashImpl.…` directly.
  */
object TextHashImpl {

  /** MinHash modulus, shared with [[graft.llm.TextFunctions]]. */
  val P: Long = 2147483647L

  /** Same derivation as TextFunctions.minhashCoeffs — kept in lockstep
    * (asserted by unit test). */
  def coeffA(i: Int): Long = {
    val a = (1103515245L * (2 * i + 1) + 12345L) % P
    if (a == 0L) 1L else a
  }
  def coeffB(i: Int): Long = (1103515245L * (2 * i + 2) + 54321L) % P

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val SpaceSep = UTF8String.fromString(" ")

  /** Adjacent word n-grams over a token array, joined with a single
    * space — byte-for-byte what `concat_ws(" ", t[i..i+n-1])` builds,
    * but one tight JVM loop instead of an interpreted higher-order
    * `transform` (which costs ~4x the tokenize itself at sf0.1; q110
    * round-7 history). Empty below `n` tokens; null tokens skipped by
    * concatWs exactly as concat_ws skips them. */
  def ngramJoin(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SpaceSep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over a token array: one md5 per token, `n`
    * affine-permutation running minima. Null iff zero tokens. */
  def minhashSignature(tokens: ArrayData, n: Int): ArrayData = {
    val num = tokens.numElements()
    if (num == 0) return null
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, P)
    val digest = md5Local.get()
    var i = 0
    while (i < num) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        // first 8 hex chars of md5 == first 4 bytes, big-endian unsigned
        val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % P
        var k = 0
        while (k < n) {
          val v = (coeffA(k) * h + coeffB(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array as a '0'/'1' string. Bit j comes
    * from bit (j%4) of hex nibble (j/4) of each token's md5; zero tokens
    * -> all zeros. */
  def simhash64(tokens: ArrayData): UTF8String = {
    val num = tokens.numElements()
    val out = new Array[Byte](64)
    if (num == 0) {
      java.util.Arrays.fill(out, '0'.toByte)
      return UTF8String.fromBytes(out)
    }
    val votes = new Array[Int](64)
    val digest = md5Local.get()
    var i = 0
    while (i < num) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        var j = 0
        while (j < 64) {
          val nibIdx = j >> 2
          val b = d(nibIdx >> 1) & 0xff
          val nib = if ((nibIdx & 1) == 0) (b >>> 4) & 15 else b & 15
          votes(j) += (((nib >> (j & 3)) & 1) << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var j = 0
    while (j < 64) {
      out(j) = if (votes(j) >= 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5-prefix 48-bit hash of each string, sorted and deduped — the
    * compact shingle representation (8-byte elements instead of string
    * objects). 12 hex chars = first 6 md5 bytes big-endian, identical to
    * SQL `CAST(concat('0x', substr(md5(s),1,12)) AS BIGINT)`. Hash
    * collisions (~n^2/2^49) are deterministic and engine-identical, so
    * set cardinalities still agree exactly across engines. */
  def hash48SortDedup(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    val digest = md5Local.get()
    var i = 0
    var m = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        digest.reset()
        val d = digest.digest(s.getBytes)
        hs(m) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
        m += 1
      }
      i += 1
    }
    val trimmed = if (m == n) hs else java.util.Arrays.copyOf(hs, m)
    java.util.Arrays.sort(trimmed)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || trimmed(w - 1) != trimmed(r)) {
        trimmed(w) = trimmed(r); w += 1
      }
      r += 1
    }
    new GenericArrayData(
      if (w == m) trimmed else java.util.Arrays.copyOf(trimmed, w))
  }

  /** Character n-gram 48-bit shingle hashes of a (pre-normalized) text:
    * every n-code-point window, md5-48bit hashed, sorted, deduped. One
    * JVM pass — equivalent to hash48SortDedup(per-char substr n-grams)
    * but without materializing any intermediate string arrays. Code-point
    * windows are computed on UTF-8 bytes (continuation bytes 10xxxxxx are
    * not window starts), matching both Spark substr and SQL substring
    * character semantics. */
  def ngramHash48(text: UTF8String, n: Int): ArrayData = {
    // the positional hash sequence IS windowHashes48's kernel (same
    // UTF-8 start walk, same md5-48 layout — keep ONE copy so a kernel
    // fix can never desynchronize the n-gram set from the winnowing
    // family); this wrapper only adds the sort + dedup
    val hs = windowHashes48(text, n)
    val m = hs.length
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || hs(w - 1) != hs(r)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(
      if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Per-position k-char-window 48-bit md5 hashes (the positional
    * k-gram sequence of [[winnowFingerprint]], WITHOUT the winnowing):
    * element i (0-based) hashes chars [i, i+k) — one digest over the
    * byte slice per window, no substring copies, no row-level Column
    * machinery. Same hash family as the q51 oracle, so DuckDB mirrors
    * it with md5(substr(...)). Fewer than k chars -> empty. */
  def charWindowHash48(text: UTF8String, k: Int): ArrayData =
    new GenericArrayData(windowHashes48(text, k))

  /** Shared kernel: positional 48-bit md5 hashes of every k-char
    * window (one digest per window over the UTF-8 byte slice; char
    * starts walked once). Empty when the text has fewer than k chars.
    * Used by both [[charWindowHash48]] and [[winnowFingerprint]]. */
  private def windowHashes48(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length + 1)
    var nc = 0
    var off = 0
    while (off < bytes.length) {
      if ((bytes(off) & 0xc0) != 0x80) { starts(nc) = off; nc += 1 }
      off += 1
    }
    starts(nc) = bytes.length
    if (nc < k) return Array.emptyLongArray
    val m = nc - k + 1
    val hs = new Array[Long](m)
    val digest = md5Local.get()
    var i = 0
    while (i < m) {
      digest.reset()
      digest.update(bytes, starts(i), starts(i + k) - starts(i))
      val d = digest.digest()
      hs(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    hs
  }

  /** Winnowing document fingerprint (the MOSS k-gram algorithm,
    * Schleimer/Wilkerson/Aiken 2003): the POSITIONAL char n-gram
    * 48-bit hash sequence, then the minimum hash VALUE of every
    * w-length window, selected set sorted + deduped. Any substring
    * match of length >= w + n - 1 between two documents is guaranteed
    * to share at least one fingerprint. Fewer than w hashes -> one
    * window over the whole sequence; fewer than n chars -> empty. */
  def winnowFingerprint(text: UTF8String, n: Int, w: Int): ArrayData = {
    val hs = windowHashes48(text, n)
    if (hs.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val m = hs.length
    val nw = math.max(m - w + 1, 1)
    val sel = new Array[Long](nw)
    var j = 0
    while (j < nw) {
      var mn = hs(j)
      var o = 1
      val lim = math.min(w, m - j)
      while (o < lim) {
        val v = hs(j + o)
        if (v < mn) mn = v
        o += 1
      }
      sel(j) = mn
      j += 1
    }
    java.util.Arrays.sort(sel)
    var d2 = 0
    var r = 0
    while (r < nw) {
      if (d2 == 0 || sel(d2 - 1) != sel(r)) { sel(d2) = sel(r); d2 += 1 }
      r += 1
    }
    new GenericArrayData(
      if (d2 == nw) sel else java.util.Arrays.copyOf(sel, d2))
  }

  /** Intersection SIZE of two SORTED, DISTINCT long arrays by linear
    * merge — the containment-similarity kernel (inter/|A| needs the raw
    * count, not the Jaccard ratio). Same in-place read discipline as
    * [[jaccardSortedLong]]; an `array_union`-based formulation measured
    * 16x slower at sf0.1 (hash-set allocation per candidate pair). */
  def interSortedLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    var x = if (na > 0) a.getLong(0) else 0L
    var y = if (nb > 0) b.getLong(0) else 0L
    while (i < na && j < nb) {
      if (x == y) {
        inter += 1; i += 1; j += 1
        if (i < na) x = a.getLong(i)
        if (j < nb) y = b.getLong(j)
      } else if (x < y) {
        i += 1; if (i < na) x = a.getLong(i)
      } else {
        j += 1; if (j < nb) y = b.getLong(j)
      }
    }
    inter
  }

  /** Jaccard over two SORTED, DISTINCT long arrays by linear merge —
    * reads elements in place (no array copy per pair). INPUT CONTRACT:
    * no null elements — both sides come from the hash kernels
    * (ngram_hash48 / hash48_sort_dedup), which never emit nulls; the
    * hot verify loop stays free of per-element null tests. */
  def jaccardSortedLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    var x = if (na > 0) a.getLong(0) else 0L
    var y = if (nb > 0) b.getLong(0) else 0L
    while (i < na && j < nb) {
      if (x == y) {
        inter += 1; i += 1; j += 1
        if (i < na) x = a.getLong(i)
        if (j < nb) y = b.getLong(j)
      } else if (x < y) {
        i += 1; if (i < na) x = a.getLong(i)
      } else {
        j += 1; if (j < nb) y = b.getLong(j)
      }
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Threshold-aware Jaccard over two SORTED, DISTINCT long arrays:
    * returns the EXACT jaccard when it can still round (6 dp, half-up)
    * to >= `t`, and null as soon as the running upper bound proves it
    * cannot — `inter_final <= inter + min(remaining)`, so
    * `UB = interMax / (na + nb - interMax)`. The bail margin is
    * `t - 5e-7` (the 6-dp round boundary) minus a 1e-9 float-safety
    * slack, so NO pair whose rounded value passes the filter is ever
    * dropped — survivors carry bit-identical values to
    * [[jaccardSortedLong]]. The early exit is what makes exact
    * verification affordable on heavy-collision candidate streams:
    * most candidates fail the threshold long before the merge ends. */
  def jaccardGeSortedLong(a: ArrayData, b: ArrayData, t: Double)
  : java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return null
    val tAdj = t - 5e-7
    val sum = (na + nb).toDouble
    // length filter: even a full overlap of the shorter side fails
    val interCap = if (na < nb) na else nb
    if (interCap * (1.0 + tAdj) < tAdj * sum - 1e-9) return null
    var i = 0; var j = 0; var inter = 0
    var x = if (na > 0) a.getLong(0) else 0L
    var y = if (nb > 0) b.getLong(0) else 0L
    while (i < na && j < nb) {
      if (x == y) {
        inter += 1; i += 1; j += 1
        if (i < na) x = a.getLong(i)
        if (j < nb) y = b.getLong(j)
      } else {
        if (x < y) { i += 1; if (i < na) x = a.getLong(i) }
        else { j += 1; if (j < nb) y = b.getLong(j) }
        // a miss lowers the bound; a match never does — check here
        val ra = na - i; val rb = nb - j
        val interMax = inter + (if (ra < rb) ra else rb)
        if (interMax * (1.0 + tAdj) < tAdj * sum - 1e-9) return null
      }
    }
    val jac = inter.toDouble / (na + nb - inter).toDouble
    if (jac >= tAdj) java.lang.Double.valueOf(jac) else null
  }

  /** Jaccard similarity of two SORTED, DISTINCT string arrays by linear
    * merge — no hash-set allocation (equal to (|A|+|B|-|U|)/|U| with a
    * hash union, but O(n+m)). Both-empty -> 0. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // null elements are SKIPPED (treated as absent from the set):
    // this is the registered SQL surface, so arbitrary user arrays
    // must not NPE in the merge; sort_array puts nulls first, so the
    // skip happens once up front in the common case
    var i = 0; var j = 0; var inter = 0
    var nna = 0; var nnb = 0
    var k = 0
    while (k < na) { if (!a.isNullAt(k)) nna += 1; k += 1 }
    k = 0
    while (k < nb) { if (!b.isNullAt(k)) nnb += 1; k += 1 }
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getUTF8String(i); val y = b.getUTF8String(j)
        val c = x.compareTo(y)
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    val union = nna + nnb - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}

/** `minhash_signature(tokens, n) -> ARRAY<LONG>` (null iff zero tokens).
  * Native expression so the per-token md5 loop runs as one JVM call
  * inside whole-stage codegen instead of an interpreted HOF chain. */
case class MinHashSignature(tokens: Expression, numHashes: Expression)
  extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = numHashes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  private lazy val n: Int = numHashes.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _)
        if numHashes.foldable && numHashes.dataType == IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "minhash_signature expects (ARRAY<STRING>, literal INT)")
    }

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else TextHashImpl.minhashSignature(t.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = tokens.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.TextHashImpl.minhashSignature(
            ${childGen.value}, $n);
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, numHashes = newRight)
}

/** `simhash64(tokens) -> CHAR(64) of '0'/'1'`. */
case class SimHash64(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects ARRAY<STRING>, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    TextHashImpl.simhash64(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(tokens = newChild)
}

/** `jaccard_sorted(a, b) -> DOUBLE` over sorted distinct arrays of
  * strings OR longs (dispatches on input type). */
case class JaccardSorted(a: Expression, b: Expression)
  extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  private lazy val isLong = a.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted expects two ARRAY<STRING> or two ARRAY<LONG>, got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    if (isLong)
      TextHashImpl.jaccardSortedLong(x.asInstanceOf[ArrayData],
        y.asInstanceOf[ArrayData])
    else
      TextHashImpl.jaccardSorted(x.asInstanceOf[ArrayData],
        y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = if (isLong) "jaccardSortedLong" else "jaccardSorted"
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.TextHashImpl.$fn($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

/** `jaccard_ge_sorted(a, b, t) -> DOUBLE?` over sorted distinct
  * ARRAY<LONG>: the exact jaccard when it can still round (6 dp) to
  * >= `t`, NULL once the merge's running upper bound proves it cannot
  * (early exit — see [[TextHashImpl.jaccardGeSortedLong]]). The
  * verify-stage kernel for thresholded candidate streams; survivors
  * carry values bit-identical to `jaccard_sorted`. */
case class JaccardGeSorted(a: Expression, b: Expression, t: Expression)
  extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = t
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_ge_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, t.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), DoubleType)
        if t.foldable => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "jaccard_ge_sorted expects (ARRAY<LONG>, ARRAY<LONG>, " +
          s"literal DOUBLE), got $other")
    }

  override def nullSafeEval(x: Any, y: Any, tv: Any): Any =
    TextHashImpl.jaccardGeSortedLong(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData], tv.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, tv) => {
      val r = ctx.freshName("jge")
      s"""
         |java.lang.Double $r =
         |  graft.functions.TextHashImpl.jaccardGeSortedLong($x, $y, $tv);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
  : Expression = copy(a = newFirst, b = newSecond, t = newThird)
}

/** `inter_size_sorted(a, b) -> BIGINT`: intersection size of two
  * sorted distinct ARRAY<LONG> by linear merge (the containment-
  * similarity kernel — see [[TextHashImpl.interSortedLong]]). */
case class InterSizeSorted(a: Expression, b: Expression)
  extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = LongType
  override def prettyName: String = "inter_size_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inter_size_sorted expects two ARRAY<LONG>, got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    TextHashImpl.interSortedLong(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.TextHashImpl.interSortedLong($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

/** `ngram_hash48(text, n) -> ARRAY<LONG>`: sorted distinct md5-48bit
  * hashes of all n-code-point windows of `text`. */
case class NgramHash48(text: Expression, n: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash48"

  private lazy val nVal: Int = n.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(text.dataType == StringType && n.foldable &&
      n.dataType == IntegerType)) TypeCheckResult.TypeCheckFailure(
      "ngram_hash48 expects (STRING, literal INT)")
    else if (n.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("ngram_hash48: n must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else TextHashImpl.ngramHash48(t.asInstanceOf[UTF8String], nVal)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val textGen = text.genCode(ctx)
    ev.copy(code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextHashImpl.ngramHash48(
            ${textGen.value}, $nVal);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, n = newRight)
}

/** `ngram_join(tokens ARRAY<STRING>, n literal INT) -> ARRAY<STRING>`:
  * adjacent word n-grams joined with a single space (the gram stream
  * of heavy-hitter / n-gram-LM queries). Native so the join loop runs
  * inside whole-stage codegen instead of an interpreted `transform`
  * lambda re-evaluating `concat_ws`+`element_at` per element. */
case class NgramJoin(tokens: Expression, n: Expression)
  extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = n
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_join"

  private lazy val nVal: Int = n.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _)
        if n.foldable && n.dataType == IntegerType =>
        val nv = n.eval().asInstanceOf[Int]
        if (nv >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"ngram_join n must be >= 1, got $nv")
      case other =>
        // name the argument that is actually wrong
        val detail = other match {
          case ArrayType(StringType, _) if !n.foldable =>
            "n must be a literal"
          case ArrayType(StringType, _) =>
            s"n was ${n.dataType.simpleString}, need INT"
          case _ => s"tokens was ${other.simpleString}"
        }
        TypeCheckResult.TypeCheckFailure(
          s"ngram_join expects (ARRAY<STRING>, literal INT): $detail")
    }

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) null
    else TextHashImpl.ngramJoin(t.asInstanceOf[ArrayData], nVal)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tokGen = tokens.genCode(ctx)
    ev.copy(code =
      code"""
        ${tokGen.code}
        boolean ${ev.isNull} = ${tokGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextHashImpl.ngramJoin(
            ${tokGen.value}, $nVal);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, n = newRight)
}

/** `winnow_fingerprint(text, n, w) -> ARRAY<LONG>`: the winnowed
  * document fingerprint (sorted distinct window-min char-n-gram
  * hashes). Native so the rolling scan + window minima run as one JVM
  * pass inside whole-stage codegen. */
case class WinnowFingerprint(text: Expression, n: Expression,
                             w: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = text
  override def second: Expression = n
  override def third: Expression = w
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private lazy val nVal: Int = n.eval().asInstanceOf[Int]
  private lazy val wVal: Int = w.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(text.dataType == StringType &&
      n.foldable && n.dataType == IntegerType &&
      w.foldable && w.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        "winnow_fingerprint expects (STRING, literal INT, literal INT)")
    else if (n.eval().asInstanceOf[Int] < 1 ||
      w.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        "winnow_fingerprint: n and w must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else TextHashImpl.winnowFingerprint(
      t.asInstanceOf[UTF8String], nVal, wVal)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val textGen = text.genCode(ctx)
    ev.copy(code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextHashImpl.winnowFingerprint(
            ${textGen.value}, $nVal, $wVal);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
  : Expression = copy(text = newFirst, n = newSecond, w = newThird)
}

/** `char_window_hashes(text, k) -> ARRAY<LONG>`: per-position k-char
  * window 48-bit hashes. Native so the whole document hashes in one
  * JVM pass over the byte array — the Column-level equivalent
  * (explode positions, then per-row substr + md5 + hex prefix)
  * allocates a substring and a hex string per window and shuffles
  * 16-char keys instead of LONGs; switching q80 to this expression
  * took it from 12.0s to ~2s at sf0.1. */
case class CharWindowHashes(text: Expression, k: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = k
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_hashes"

  private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(text.dataType == StringType &&
      k.foldable && k.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        "char_window_hashes expects (STRING, literal INT)")
    else if (k.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        "char_window_hashes: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else TextHashImpl.charWindowHash48(t.asInstanceOf[UTF8String], kVal)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val textGen = text.genCode(ctx)
    ev.copy(code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextHashImpl.charWindowHash48(
            ${textGen.value}, $kVal);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, k = newRight)
}

/** `hash48_sort_dedup(ARRAY<STRING>) -> ARRAY<LONG>`: md5-48bit hash of
  * each element, sorted, deduped. */
case class Hash48SortDedup(arr: Expression) extends UnaryExpression {

  override def child: Expression = arr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash48_sort_dedup"

  override def checkInputDataTypes(): TypeCheckResult =
    arr.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hash48_sort_dedup expects ARRAY<STRING>, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    TextHashImpl.hash48SortDedup(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashImpl.hash48SortDedup($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(arr = newChild)
}
