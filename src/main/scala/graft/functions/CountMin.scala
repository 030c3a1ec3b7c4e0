package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Count-min sketch over 64-bit hash values (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications") — the engine's frequency prefilter for heavy-hitter
  * queries whose key space is too wide to exact-count in one pass.
  *
  * The sketch NEVER undercounts (every estimate >= the true count), so
  * `estimate >= T` selects a SUPERSET of the true heavy hitters — an
  * exact count restricted to those candidates is then exactly the
  * `HAVING count(*) >= T` answer. Same prefilter-then-exact-verify
  * contract as [[BloomImpl]]: the output stays oracle-exact at any
  * scale factor; only the shuffled volume is probabilistic.
  *
  * Determinism: counters add elementwise on merge, so build/merge
  * order never changes the sketch; serialization is the fixed-layout
  * counter matrix. Row hashes derive from the shared splitmix64
  * finisher ([[BloomImpl.mix]]) with the Kirsch-Mitzenmacher
  * `h1 + i*h2` scheme; `width` must be a power of two.
  *
  * Wire format (little-endian): `i32 depth | i32 width |
  * depth*width * i64` (row-major).
  */
object CmsImpl {

  final class Buffer(val depth: Int, val width: Int,
                     val rows: Array[Long]) {
    private val mask = width - 1

    def add(h: Long): Unit = {
      val h1 = BloomImpl.mix(h)
      val h2 = BloomImpl.mix(h ^ 0x9E3779B97F4A7C15L) | 1L
      var i = 0
      var idx = h1
      while (i < depth) {
        rows(i * width + (idx & mask).toInt) += 1L
        idx += h2
        i += 1
      }
    }

    def estimate(h: Long): Long = {
      val h1 = BloomImpl.mix(h)
      val h2 = BloomImpl.mix(h ^ 0x9E3779B97F4A7C15L) | 1L
      var min = Long.MaxValue
      var i = 0
      var idx = h1
      while (i < depth) {
        val c = rows(i * width + (idx & mask).toInt)
        if (c < min) min = c
        idx += h2
        i += 1
      }
      min
    }

    def mergeFrom(o: Buffer): Unit = {
      var i = 0
      while (i < rows.length) { rows(i) += o.rows(i); i += 1 }
    }

    def serialize: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + rows.length * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(depth).putInt(width)
      var i = 0
      while (i < rows.length) { bb.putLong(rows(i)); i += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val d = bb.getInt
    val w = bb.getInt
    val rows = new Array[Long](d * w)
    var i = 0
    while (i < rows.length) { rows(i) = bb.getLong; i += 1 }
    new Buffer(d, w, rows)
  }
}

/** Read-side estimator: parsed once per plan from the foldable literal
  * (the [[BloomProbe]] pattern); per-row cost is `depth` masked loads. */
final class CmsProbe(bytes: Array[Byte]) extends Serializable {
  @transient private lazy val buf = CmsImpl.deserialize(bytes)
  def estimate(h: Long): Long = buf.estimate(h)
}

/** `cms_agg(h BIGINT, width INT, depth INT) -> BINARY`: aggregate hash
  * values into a count-min sketch. Partial aggregation applies;
  * partials ADD elementwise, so the single-row shuffle carries
  * `depth*width*8` bytes per map task, never the raw keys. */
case class CmsAgg(child: Expression, width: Expression, depth: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsImpl.Buffer] {

  override def children: Seq[Expression] = Seq(child, width, depth)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg expects BIGINT input, got ${child.dataType}")
    else if (!width.foldable || !depth.foldable ||
      width.dataType != IntegerType || depth.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "cms_agg expects foldable INT width and depth")
    else {
      val w = width.eval().asInstanceOf[Int]
      val d = depth.eval().asInstanceOf[Int]
      if (w < 16 || (w & (w - 1)) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"cms_agg width must be a power of two >= 16, got $w")
      else if (d < 1 || d > 16)
        TypeCheckResult.TypeCheckFailure(
          s"cms_agg depth must be in [1, 16], got $d")
      else if (d.toLong * w > (1 << 27))
        // the buffer is one Array[Long](d * w): bound it (1 GiB) so
        // d * w can neither overflow Int nor silently allocate more
        // per-task memory than any sketch should hold
        TypeCheckResult.TypeCheckFailure(
          s"cms_agg depth * width must be <= 2^27 cells, got ${d.toLong * w}")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): CmsImpl.Buffer = {
    val w = width.eval().asInstanceOf[Int]
    val d = depth.eval().asInstanceOf[Int]
    new CmsImpl.Buffer(d, w, new Array[Long](d * w))
  }

  override def update(buf: CmsImpl.Buffer,
                      input: InternalRow): CmsImpl.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CmsImpl.Buffer,
                     other: CmsImpl.Buffer): CmsImpl.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: CmsImpl.Buffer): Any = buf.serialize

  override def serialize(buf: CmsImpl.Buffer): Array[Byte] =
    buf.serialize

  override def deserialize(bytes: Array[Byte]): CmsImpl.Buffer =
    CmsImpl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), width = newChildren(1),
      depth = newChildren(2))
}

/** `cms_estimate(cms foldable BINARY, h BIGINT) -> BIGINT`: upper-bound
  * frequency of `h` in a driver-built sketch inlined as a literal —
  * never below the true count. Sits map-side BELOW any exchange, so
  * light keys' occurrences never shuffle. */
case class CmsEstimate(cms: Expression, h: Expression)
  extends BinaryExpression {

  override def left: Expression = cms
  override def right: Expression = h
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (cms.dataType == BinaryType && cms.foldable &&
      h.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cms_estimate expects (foldable BINARY, BIGINT)")

  @transient private lazy val probe: CmsProbe =
    new CmsProbe(cms.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(bm: Any, hv: Any): Any =
    probe.estimate(hv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", probe,
      classOf[CmsProbe].getName)
    defineCodeGen(ctx, ev, (_, hv) => s"$ref.estimate($hv)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(cms = newLeft, h = newRight)
}
