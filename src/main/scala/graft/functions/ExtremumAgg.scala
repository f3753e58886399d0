package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

  // SQL-registered callers can hand us any dtype — reject unorderable
  // orderings (map, ...) at analysis time, not with a runtime throw
  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(orderingExpr.dataType, prettyName)

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
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  // coerce narrower integrals at analysis time — the update path's
  // asInstanceOf[Long] would otherwise CCE on an INT column in SQL
  // (no type ascription: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType)

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

/** Bounded per-group top-k values (descending array<double>), with a
  * k-size min-heap buffer — the scale-correct alternative to
  * `slice(sort_array(collect_list(v)))`, whose buffer is the whole
  * group. State is O(k) per group at every stage, map-side combinable
  * (partial heaps merge), so a 10⁹-row group costs the same shuffle
  * bytes as a 10²-row one. Null and NaN are skipped (a top-k over
  * missing values is noise — same rule as the nan* reductions); a
  * group with no valid values evals an empty array. Duplicated values
  * are kept (top-k VALUES, not distinct values).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with ImplicitCastInputTypes {

  require(k >= 1, s"topk: k must be >= 1, got $k")

  // numeric inputs coerce to double at analysis time (same contract as
  // the built-in double aggs) instead of a runtime ClassCastException
  override def inputTypes = Seq(DoubleType)

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k) // min-heap: head = kth-largest

  private def offer(heap: java.util.PriorityQueue[java.lang.Double], d: Double): Unit =
    if (!d.isNaN) {
      if (heap.size < k) heap.offer(d)
      else if (d > heap.peek()) { heap.poll(); heap.offer(d) }
    }

  override def update(heap: java.util.PriorityQueue[java.lang.Double],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Double])
    heap
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Double],
                     b: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    var lo = 0; var hi = arr.length - 1
    while (lo < hi) { val t = arr(lo); arr(lo) = arr(hi); arr(hi) = t; lo += 1; hi -= 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(heap.size * 8)
    val it = heap.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val heap = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) heap.offer(bb.getDouble())
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_topk"
}

/** Bounded per-group top-k PAYLOADS — [[TopKAgg]]'s payload-carrying
  * sibling and [[ExtremumByAgg]]'s k>1 form: a k-bounded min-heap of
  * (ordering, value) pairs, evaluating to the k ordering-LARGEST
  * payloads in descending ordering order. State is O(k) per group at
  * every stage and partial heaps merge map-side, so this is the
  * scale-correct alternative to `row_number().over(partitionBy(g))`
  * for per-group caps: the window sorts EVERY row of a group on one
  * task, the heap ships k·#groups rows through the shuffle. Callers
  * make the ordering a TOTAL order (fold a unique tiebreaker in) for
  * deterministic output; rows whose ordering evaluates null are
  * skipped (the [[ExtremumByAgg]] rule).
  */
case class TopKByAgg(
    valueExpr: Expression,
    orderingExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[ExtremumBuf]] {

  require(k >= 1, s"topKBy: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, orderingExpr)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(valueExpr.dataType,
      containsNull = valueExpr.nullable)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(orderingExpr.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderingExpr.dataType)

  private def newHeap(): java.util.PriorityQueue[ExtremumBuf] =
    new java.util.PriorityQueue[ExtremumBuf](k,
      (a: ExtremumBuf, b: ExtremumBuf) => ordering.compare(a.ord, b.ord))

  override def createAggregationBuffer(): java.util.PriorityQueue[ExtremumBuf] =
    newHeap()

  private def offer(heap: java.util.PriorityQueue[ExtremumBuf],
                    ord: Any, value: Any, copied: Boolean): Unit =
    if (ord != null) {
      val admit = heap.size < k || ordering.compare(ord, heap.peek().ord) > 0
      if (admit) {
        if (heap.size >= k) heap.poll()
        val (o, v) =
          if (copied) (ord, value)
          else (InternalRow.copyValue(ord), InternalRow.copyValue(value))
        heap.offer(new ExtremumBuf(o, v))
      }
    }

  override def update(heap: java.util.PriorityQueue[ExtremumBuf],
                      input: InternalRow): java.util.PriorityQueue[ExtremumBuf] = {
    offer(heap, orderingExpr.eval(input), valueExpr.eval(input),
      copied = false)
    heap
  }

  override def merge(a: java.util.PriorityQueue[ExtremumBuf],
                     b: java.util.PriorityQueue[ExtremumBuf]): java.util.PriorityQueue[ExtremumBuf] = {
    val it = b.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(a, e.ord, e.value, copied = true) // b's entries were copied
    }
    a
  }

  override def eval(heap: java.util.PriorityQueue[ExtremumBuf]): Any = {
    val arr = heap.toArray(new Array[ExtremumBuf](heap.size))
    java.util.Arrays.sort(arr,
      (a: ExtremumBuf, b: ExtremumBuf) => ordering.compare(b.ord, a.ord))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      arr.map(_.value))
  }

  // shuffle format: length-prefixed UnsafeRow [ordering, value] slices
  @transient private lazy val projection =
    UnsafeProjection.create(Array(orderingExpr.dataType, valueExpr.dataType))

  override def serialize(heap: java.util.PriorityQueue[ExtremumBuf]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    val it = heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = projection(InternalRow(e.ord, e.value)).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[ExtremumBuf] = {
    val heap = newHeap()
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    while (in.available() > 0) {
      val len = in.readInt()
      val slice = new Array[Byte](len)
      in.readFully(slice)
      val row = new UnsafeRow(2)
      row.pointTo(slice, len)
      // the slice is owned by this buffer — safe to reference directly
      heap.offer(new ExtremumBuf(
        row.get(0, orderingExpr.dataType),
        row.get(1, valueExpr.dataType)))
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(valueExpr = newChildren(0), orderingExpr = newChildren(1))

  override def prettyName: String = "graft_topk_by"
}
