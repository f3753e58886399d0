package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Mutable (ordering, payload) pair tracked by [[ExtremumByAgg]].
  * `ord == null` marks the empty buffer — a row is only admitted when
  * its ordering evaluates non-null, so a populated buffer always has a
  * non-null `ord` (the payload may legitimately be null). */
final class ExtremumBuf(var ord: Any, var value: Any)

/** Deterministic `min_by`/`max_by` over ARBITRARY orderable ordering
  * types — the aggregate behind the order-dependent reduction family
  * (first/last/argmin/argmax, reference semantics
  * flox/aggregations.py:549-649) and string-valued extrema.
  *
  * Why not the built-ins:
  *  - `min(struct(idx, v))` / `max_by(v, struct(...))` put a STRUCT in
  *    the aggregation buffer, and `min_by`/`max_by` over a string value
  *    put a STRING there; either disables HashAggregateExec
  *    (UnsafeRow-mutable buffers only) and drops the whole Aggregate
  *    into SortAggregateExec — an extra per-partition sort of the raw
  *    input on every first/last/arg query at scale.
  *  - Spark's own `min_by` breaks ordering ties by encounter order —
  *    non-deterministic under shuffle.
  * As a TypedImperativeAggregate this plans through
  * ObjectHashAggregateExec instead: single hash pass, map-side partial
  * aggregation, no sort (beyond the conf'd high-cardinality fallback,
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`).
  *
  * Tie-breaking: a strictly-better ordering replaces the buffer, an
  * equal ordering keeps the incumbent. Callers make ties impossible
  * (unique idx contract) or harmless (payload == ordering).
  */
case class ExtremumByAgg(
    valueExpr: Expression,
    orderingExpr: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExtremumBuf] {

  override def children: Seq[Expression] = Seq(valueExpr, orderingExpr)

  override def dataType: DataType = valueExpr.dataType

  override def nullable: Boolean = true

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderingExpr.dataType)

  private def better(candidate: Any, incumbent: Any): Boolean = {
    val c = ordering.compare(candidate, incumbent)
    if (isMax) c > 0 else c < 0
  }

  override def createAggregationBuffer(): ExtremumBuf =
    new ExtremumBuf(null, null)

  override def update(buf: ExtremumBuf, input: InternalRow): ExtremumBuf = {
    val o = orderingExpr.eval(input)
    if (o != null && (buf.ord == null || better(o, buf.ord))) {
      // copy: eval results may alias reused backing rows/arrays
      buf.ord = InternalRow.copyValue(o)
      buf.value = InternalRow.copyValue(valueExpr.eval(input))
    }
    buf
  }

  override def merge(a: ExtremumBuf, b: ExtremumBuf): ExtremumBuf =
    if (b.ord != null && (a.ord == null || better(b.ord, a.ord))) b else a

  override def eval(buf: ExtremumBuf): Any =
    if (buf.ord == null) null else buf.value

  // shuffle format: one UnsafeRow [ordering, value]; empty buffer = 0 bytes
  @transient private lazy val projection =
    UnsafeProjection.create(Array(orderingExpr.dataType, valueExpr.dataType))

  override def serialize(buf: ExtremumBuf): Array[Byte] =
    if (buf.ord == null) Array.emptyByteArray
    else projection(InternalRow(buf.ord, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ExtremumBuf =
    if (bytes.isEmpty) new ExtremumBuf(null, null)
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      // the byte array is owned by this buffer — no further copy needed
      new ExtremumBuf(
        row.get(0, orderingExpr.dataType),
        row.get(1, valueExpr.dataType))
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExtremumByAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ExtremumByAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExtremumByAgg =
    copy(valueExpr = newChildren(0), orderingExpr = newChildren(1))

  override def prettyName: String = "graft_extremum_by"
}

/** Exact int64 product — Spark's built-in `product` always widens to
  * double, but the reference keeps integer dtype for integral inputs
  * (flox/xrdtypes.py:175-185 promotes to the platform int, then prod
  * stays integral with NumPy's wraparound-on-overflow semantics, which
  * Java's `*` reproduces bit-exactly). Nulls are skipped; an empty (or
  * all-null) group evals null and the caller supplies the identity
  * fill. Buffer = [product, seen] so "no rows" and "product == 1" stay
  * distinguishable.
  */
case class LongProductAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = Array(1L, 0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf(0) *= v.asInstanceOf[Long]
      buf(1) = 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b(1) == 1L) { a(0) *= b(0); a(1) = 1L }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(1) == 0L) null else buf(0)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(buf(0)); bb.putLong(buf(1))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong(), bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongProductAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): LongProductAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongProductAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_long_product"
}
