package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of an array column (embedding centroid) as a custom
  * `TypedImperativeAggregate` — the UDAF extension point (SURVEY §2 I
  * surface; the reference has no custom aggregate, this is the engine's
  * demonstration that the slot exists and scales).
  *
  * Buffer = (count, running per-dimension double sums); partial-merge is
  * elementwise add, so the aggregate combines map-side like any built-in:
  * the shuffle carries one (dim+1)-double buffer per group, not rows.
  * Null/mismatched-length arrays are ignored (counted out), matching
  * avg()'s null behavior.
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[VectorMean.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_mean expects array<float|double>, got $other")
    }

  override def createAggregationBuffer(): VectorMean.Buffer =
    new VectorMean.Buffer(0L, null)

  override def update(b: VectorMean.Buffer, input: InternalRow): VectorMean.Buffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return b // empty arrays are ignored like nulls: a zero-dim
    // buffer would serialize indistinguishably from "no data", making the
    // result depend on partitioning
    // arrays with null slots are skipped whole, like null rows — summing
    // a null slot as 0.0 (what ArrayData.getDouble silently returns) would
    // corrupt the mean instead of ignoring the malformed vector
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return b; j += 1 }
    if (b.sums == null) b.sums = new Array[Double](n)
    if (b.sums.length != n) return b // length mismatch: skip row
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var i = 0
    while (i < n) {
      b.sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    b.count += 1
    b
  }

  override def merge(b: VectorMean.Buffer, o: VectorMean.Buffer): VectorMean.Buffer = {
    if (o.sums == null) return b
    if (b.sums == null) { b.sums = o.sums.clone(); b.count = o.count; return b }
    // mixed-dimension groups are malformed input: the whole partial buffer
    // of the other dimension is discarded (coarser than update's per-row
    // skip, but never out-of-bounds; result for malformed input is
    // best-effort either way)
    if (o.sums.length != b.sums.length) return b
    var i = 0
    while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
    b.count += o.count
    b
  }

  override def eval(b: VectorMean.Buffer): Any =
    if (b.count == 0L || b.sums == null) null
    else new GenericArrayData(b.sums.map(s => (s / b.count): Any))

  override def serialize(b: VectorMean.Buffer): Array[Byte] = {
    val dim = if (b.sums == null) 0 else b.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * dim)
    bb.putLong(b.count).putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val dim = bb.getInt()
    val sums = if (dim == 0) null else Array.fill(dim)(bb.getDouble())
    new VectorMean.Buffer(count, sums)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object VectorMean {
  final class Buffer(var count: Long, var sums: Array[Double])

  /** vector_mean(col) as a Column aggregate. */
  def apply(c: Column): Column =
    GraftBridge.column(
      VectorMean(GraftBridge.expression(c)).toAggregateExpression())
}
