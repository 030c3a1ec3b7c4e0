package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Blocked-free classic Bloom filter over 64-bit hash values — the
  * engine's shuffle-volume prefilter for membership joins whose build
  * side is bounded but too large to broadcast raw (the decontamination
  * shape: a benchmark-suite shingle union is millions of entries ≈ GBs
  * as an exploded broadcast set, tens of MB as a 10-bit/key bloom).
  *
  * The filter is a PREFILTER, not an answer: `contains` may return
  * false positives (never false negatives), so any oracle-exact
  * consumer must follow it with an exact verify join — the bloom's job
  * is to keep ~99% of the probe side out of that join's shuffle. This
  * is the explicit, engine-controlled form of the runtime bloom-filter
  * join pruning modern engines inject automatically; making it a
  * first-class aggregate lets a curation pipeline build the filter
  * ONCE and reuse it across many probe passes.
  *
  * Determinism: the bit array is OR-merged, so build/merge order never
  * changes the result; serialization is the fixed-layout word array —
  * equal inputs yield equal bytes (required for a deterministic
  * aggregate result, same contract as [[IdBitmapImpl]]).
  *
  * Hashing: two independent 64-bit hashes via the splitmix64 finalizer
  * (public domain, Steele et al. "Fast splittable pseudorandom number
  * generators"), combined per-probe as `h1 + i*h2` (Kirsch &
  * Mitzenmacher, "Less hashing, same performance"). `numBits` must be
  * a power of two so the index reduce is a mask, not a modulo.
  *
  * Wire format (little-endian): `i32 numHashes | i32 numWords |
  * numWords * i64`.
  */
object BloomImpl {

  /** splitmix64 finalizer — avalanches all 64 input bits. */
  @inline def mix(x0: Long): Long = {
    var z = x0
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final class Buffer(val numHashes: Int, val words: Array[Long]) {
    private val mask = words.length * 64 - 1 // numBits is a power of two

    def add(h: Long): Unit = {
      val h1 = mix(h)
      val h2 = mix(h ^ 0x9E3779B97F4A7C15L) | 1L // odd => full-period step
      var i = 0
      var idx = h1
      while (i < numHashes) {
        val bit = (idx & mask).toInt
        words(bit >>> 6) |= 1L << (bit & 63)
        idx += h2
        i += 1
      }
    }

    def mergeFrom(o: Buffer): Unit = {
      var w = 0
      while (w < words.length) { words(w) |= o.words(w); w += 1 }
    }

    def serialize: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + words.length * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(numHashes).putInt(words.length)
      var w = 0
      while (w < words.length) { bb.putLong(words(w)); w += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = bb.getInt
    val n = bb.getInt
    val words = new Array[Long](n)
    var w = 0
    while (w < n) { words(w) = bb.getLong; w += 1 }
    new Buffer(k, words)
  }

  /** Bits for a target ~1% false-positive rate at `n` keys (10
    * bits/key, k=7 ≈ 0.82%), rounded up to a power of two, floored at
    * 2^13 bits = 1 KiB so tiny build sides don't degenerate. */
  def suggestBits(n: Long): Int = {
    val want = math.max(8192L, n * 10L)
    var bits = 8192
    while (bits < want && bits < (1 << 30)) bits <<= 1
    bits
  }
}

/** Read-side probe: parsed once per plan from the foldable literal and
  * referenced from generated code — per-row cost is k masked word
  * loads, zero allocation (the [[IdBitmapProbe]] pattern). */
final class BloomProbe(bytes: Array[Byte]) extends Serializable {
  @transient private lazy val buf = BloomImpl.deserialize(bytes)

  def contains(h: Long): Boolean = {
    val b = buf
    val words = b.words
    val mask = words.length * 64 - 1
    val h1 = BloomImpl.mix(h)
    val h2 = BloomImpl.mix(h ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    var idx = h1
    while (i < b.numHashes) {
      val bit = (idx & mask).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      idx += h2
      i += 1
    }
    true
  }
}

/** `bloom_agg(h BIGINT, numBits INT, numHashes INT) -> BINARY`:
  * aggregate hash values into a Bloom filter. Partial aggregation
  * applies; partials OR-merge, so the single-row shuffle carries
  * `numBits/8` bytes per map task, never the raw keys. `numBits` must
  * be a foldable power of two, `numHashes` a foldable positive int. */
case class BloomAgg(child: Expression, numBits: Expression,
                    numHashes: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomImpl.Buffer] {

  override def children: Seq[Expression] = Seq(child, numBits, numHashes)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg expects BIGINT input, got ${child.dataType}")
    else if (!numBits.foldable || !numHashes.foldable ||
      numBits.dataType != IntegerType || numHashes.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "bloom_agg expects foldable INT numBits and numHashes")
    else {
      val m = numBits.eval().asInstanceOf[Int]
      val k = numHashes.eval().asInstanceOf[Int]
      if (m < 64 || (m & (m - 1)) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"bloom_agg numBits must be a power of two >= 64, got $m")
      else if (k < 1 || k > 32)
        TypeCheckResult.TypeCheckFailure(
          s"bloom_agg numHashes must be in [1, 32], got $k")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): BloomImpl.Buffer =
    new BloomImpl.Buffer(numHashes.eval().asInstanceOf[Int],
      new Array[Long](numBits.eval().asInstanceOf[Int] / 64))

  override def update(buf: BloomImpl.Buffer,
                      input: InternalRow): BloomImpl.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomImpl.Buffer,
                     other: BloomImpl.Buffer): BloomImpl.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: BloomImpl.Buffer): Any = buf.serialize

  override def serialize(buf: BloomImpl.Buffer): Array[Byte] =
    buf.serialize

  override def deserialize(bytes: Array[Byte]): BloomImpl.Buffer =
    BloomImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), numBits = newChildren(1),
      numHashes = newChildren(2))
}

/** `bloom_contains(bloom foldable BINARY, h BIGINT) -> BOOLEAN`:
  * probabilistic membership probe against a driver-built filter inlined
  * as a literal — may return true for absent keys (by design), never
  * false for present ones. Sits map-side BELOW any exchange, so the
  * rows it rejects never shuffle. */
case class BloomContains(bloom: Expression, h: Expression)
  extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = h
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloom.dataType == BinaryType && bloom.foldable &&
      h.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_contains expects (foldable BINARY, BIGINT)")

  @transient private lazy val probe: BloomProbe =
    new BloomProbe(bloom.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(bm: Any, hv: Any): Any =
    probe.contains(hv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", probe,
      classOf[BloomProbe].getName)
    defineCodeGen(ctx, ev, (_, hv) => s"$ref.contains($hv)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, h = newRight)
}
