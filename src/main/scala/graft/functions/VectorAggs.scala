package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of vector columns: `array<double>` rows fold into one
  * dims-length sum array per group. The shuffle-side payload of a
  * grouped mean over vectors becomes one partial-sum row per (group,
  * partition) — the map-side-combine shape k-means needs — instead of
  * the #rows x dims exploded (group, pos) rows of the
  * posexplode-then-avg formulation (Similarity.dimMeans keeps that
  * shape where per-dimension output ROWS are the contract).
  *
  * Null rows are skipped (count them separately with count(col) if the
  * denominator must match); null ELEMENTS poison their position to
  * null, mirroring double + null = null addition. A length mismatch
  * between rows is an error — vectors of different dims in one group
  * mean the caller grouped the wrong thing.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ImplicitCastInputTypes {

  // null positions carry as NaN inside the buffer with a parallel
  // validity word per 64 dims? No — keep it simple: a null element
  // poisons the position to NaN and eval re-emits NaN. flox-side
  // callers pass containsNull=false arrays (cast from parquet floats),
  // so the NaN lane only exists for defensive completeness.

  override def children: Seq[Expression] = Seq(child)

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] is a
  // covariant subtype of the declared Seq[AbstractDataType].
  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.length == 0) new Array[Double](n)
      else {
        require(buffer.length == n,
          s"vector_sum: dims mismatch within group (${buffer.length} vs $n)")
        buffer
      }
    var i = 0
    while (i < n) {
      buf(i) += (if (arr.isNullAt(i)) Double.NaN else arr.getDouble(i))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    require(a.length == b.length,
      s"vector_sum: dims mismatch across partitions (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_vector_sum"
}

/** Numerically STABLE weighted population variance:
  * Σw(v−m̄)²/Σw via the weighted Welford update (West 1979) per row
  * and the weighted Chan merge across partials — the same
  * central-moment stability contract as Spark's own var_pop, extended
  * to frequency/real weights (Spark has no weighted moment builtin).
  * Replaces the raw-moment form Σwv²/Σw − (Σwv/Σw)², which cancels
  * catastrophically at |mean| ≫ sd — the defect class the complex
  * var fix closed for unweighted data (ReduceSpec pins the
  * large-offset law here too).
  *
  * Null inputs skip (callers mask invalid pairs to null — the
  * GroupByReduce.weighted pairOk contract); NaN inputs are expected
  * to be masked upstream but would propagate through the arithmetic
  * naturally. Zero-weight rows contribute nothing; an all-skipped
  * group is null; a zero-total-weight group with rows evaluates NaN
  * (0/0 — the raw-moment form's behavior, kept). Negative m2 from
  * pathological negative weights clamps to 0 (the old CASE clamp).
  * Buffer = 3 doubles (wtot, mean, M2): fixed-size, mergeable,
  * ObjectHashAggregate plan shape (no SortAggregate fallback). */
case class WeightedVarAgg(
    value: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(value, weight)
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // empty array = no pair seen (the VectorSumAgg sentinel convention)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v0 = value.eval(input)
    val w0 = weight.eval(input)
    if (v0 == null || w0 == null) return buffer
    val v = v0.asInstanceOf[Double]
    val w = w0.asInstanceOf[Double]
    val buf = if (buffer.length == 3) buffer else new Array[Double](3)
    val wt = buf(0) + w
    if (wt != 0.0) {
      val delta = v - buf(1)
      val mean = buf(1) + delta * (w / wt)
      buf(2) += w * delta * (v - mean)
      buf(1) = mean
    }
    buf(0) = wt
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    val wt = a(0) + b(0)
    if (wt != 0.0) {
      val delta = b(1) - a(1)
      val mean = a(1) + delta * (b(0) / wt)
      a(2) = a(2) + b(2) + delta * delta * (a(0) * (b(0) / wt))
      a(1) = mean
    } else {
      a(2) = a(2) + b(2)
    }
    a(0) = wt
    a
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null
    else if (buffer(0) == 0.0) Double.NaN // 0/0, the raw-moment parity
    else {
      val v = buffer(2) / buffer(0)
      if (v < 0.0) 0.0 else v
    }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedVarAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedVarAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedVarAgg =
    copy(value = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "graft_wvar_pop"
}
