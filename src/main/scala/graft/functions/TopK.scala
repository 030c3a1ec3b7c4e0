package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Bounded per-group top-k: the aggregate-side replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(score DESC, id ASC))
  * <= k`.
  *
  * Why it exists (r13 verdict, "What's wrong" #3): a rank window sorts
  * EVERY scored row — the kNN edge build shuffled and sorted ~400 M
  * (src, dst, score) rows at sf10 (15.1x per data decade; 616 s at
  * sf30) to keep 200 x k of them. A bounded insertion buffer keeps at
  * most k entries per group at every stage: partial aggregation
  * reduces each map task's output to (groups x k) entries BEFORE the
  * exchange, the shuffle carries serialized k-buffers instead of the
  * scored stream, and no scored row ever crosses a sort. Cost per
  * input row once a group's buffer is full is ONE comparison against
  * the current worst entry (the common case on a corpus-scale scan);
  * an insertion is an O(k) shift on arrays, k suite-typical <= 10.
  *
  * Ordering is EXACTLY the window's: score DESC, then id ASC — the
  * same (value DESC, id ASC) total order the q121 max-struct argmax
  * encodes for k = 1, so results are bit-identical to the rank-window
  * formulation the DuckDB oracles pin (callers pass the already
  * 6-dp-rounded score, as the window formulation ordered on it).
  *
  * Output: `ARRAY<STRUCT<id BIGINT, score DOUBLE>>` sorted best-first
  * (posexplode position + 1 == the window's row_number).
  *
  * Merge is order-insensitive (insertion into a totally ordered
  * bounded set), so partial/final composition is deterministic.
  * Wire format (little-endian): `i32 k | i32 size | size * (i64 id,
  * f64 score)`.
  */
object TopKImpl {

  /** (score DESC, id ASC) strict-better comparison — the single
    * ordering every entry point shares. */
  @inline def better(s1: Double, d1: Long, s2: Double, d2: Long): Boolean =
    s1 > s2 || (s1 == s2 && d1 < d2)

  final class Buffer(val k: Int) {
    var size: Int = 0
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)

    def add(id: Long, score: Double): Unit = {
      val full = size == k
      // fast reject: not better than the current worst of a full buffer
      if (full && !better(score, id, scores(k - 1), ids(k - 1))) return
      var i = if (full) k - 1 else size // slot being filled (worst drops)
      while (i > 0 && better(score, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1)
        i -= 1
      }
      scores(i) = score; ids(i) = id
      if (!full) size += 1
    }

    def mergeFrom(o: Buffer): Unit = {
      var i = 0
      while (i < o.size) { add(o.ids(i), o.scores(i)); i += 1 }
    }

    def serialize: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + size * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(k).putInt(size)
      var i = 0
      while (i < size) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    // entries arrive already ordered; add() keeps the invariant anyway
    while (i < n) {
      val id = bb.getLong; val s = bb.getDouble
      buf.add(id, s); i += 1
    }
    buf
  }
}

/** `topk_by_score(id BIGINT, score DOUBLE, k INT)
  * -> ARRAY<STRUCT<id BIGINT, score DOUBLE>>` — bounded exact top-k
  * per group, ordered (score DESC, id ASC), best first. See
  * [[TopKImpl]]. NULL ids/scores are skipped (a window rank would
  * order them last and they can never enter a top-k by score).
  * NaN scores are ALSO skipped — a DOCUMENTED divergence from the
  * rank window, which under Spark's double ordering treats NaN as
  * greater than every value and would rank NaN rows FIRST under
  * `desc` (r14 advisor). Unreachable from graft's own callers (cosine
  * kernels zero-norm-guard and 6-dp-round their scores), but the
  * function is registered on the public SQL surface, where a silent
  * NaN-at-the-top beats no contract; skip matches the NULL rule. */
case class TopKByScore(id: Expression, score: Expression, k: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKImpl.Buffer] {

  override def children: Seq[Expression] = Seq(id, score, k)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects BIGINT id, got ${id.dataType}")
    else if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects DOUBLE score, got ${score.dataType}")
    else if (!k.foldable || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "topk_by_score expects a foldable INT k")
    else {
      val kv = k.eval().asInstanceOf[Int]
      // each group holds k*16 bytes; 64K bounds the per-group buffer
      // to ~1 MB — top-k beyond that is a sort problem, not a heap one
      if (kv < 1 || kv > 65536)
        TypeCheckResult.TypeCheckFailure(
          s"topk_by_score k must be in [1, 65536], got $kv")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): TopKImpl.Buffer =
    new TopKImpl.Buffer(k.eval().asInstanceOf[Int])

  override def update(buf: TopKImpl.Buffer,
                      input: InternalRow): TopKImpl.Buffer = {
    val i = id.eval(input)
    val s = score.eval(input)
    // NULL and NaN scores never enter a buffer (contract in the class
    // doc; NaN would poison better()'s total order — every comparison
    // against NaN is false, so a buffered NaN could never be evicted)
    if (i != null && s != null && !s.asInstanceOf[Double].isNaN)
      buf.add(i.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKImpl.Buffer,
                     other: TopKImpl.Buffer): TopKImpl.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKImpl.Buffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKImpl.Buffer): Array[Byte] =
    buf.serialize

  override def deserialize(bytes: Array[Byte]): TopKImpl.Buffer =
    TopKImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), score = newChildren(1), k = newChildren(2))
}
