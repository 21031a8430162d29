package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005, J. Algorithms) — the
  * point-FREQUENCY half of the sketch toolbox: HLL answers "how many
  * distinct", KMV answers set operations, the CMS answers "how often does
  * THIS value occur" from kilobytes of state. depth × width counters,
  * one seeded hash row each; estimate = min over rows. The guarantee is
  * one-sided: estimates never undercount, and overcount by more than
  * (e/width)·N with probability ≤ exp(-depth) — which is what makes the
  * estimate ORACLE-CHECKABLE as a bounds boolean against exact counts.
  *
  * Mergeability is exact: counters are additive, so per-partition /
  * per-day sketches merged in ANY order serialize to the identical
  * byte array a single global build produces — the reaggregation
  * property that lets a 100 TB pipeline keep daily frequency sketches
  * and answer any date-range point query without rescanning.
  *
  * Storage: depth·width longs (default 5 × 8192 = 320 KB) — lake-storable
  * binary like the t-digest and KMV sketches.
  */
object CountMinSketch {

  final class State(val depth: Int, val width: Int) {
    val counters = new Array[Long](depth * width)

    def add(s: UTF8String, n: Long = 1L): Unit = {
      var r = 0
      while (r < depth) {
        counters(r * width + rowIndex(s, r, width)) += n
        r += 1
      }
    }

    def mergeFrom(o: State): Unit = {
      require(o.depth == depth && o.width == width,
        s"cannot merge CMS of shape ${o.depth}x${o.width} into ${depth}x$width")
      var i = 0
      while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
    }
  }

  /** Row-seeded index: the shared 64-bit avalanche ([[KmvSketch.hash64]])
    * split into two 32-bit halves combined linearly per row — the
    * standard h1 + r·h2 scheme (Kirsch & Mitzenmacher 2006), giving
    * depth pairwise-independent-enough rows from ONE hash evaluation.
    */
  def rowIndex(s: UTF8String, row: Int, width: Int): Int = {
    val h = KmvSketch.hash64(s)
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt | 1 // odd, so rows decorrelate even for h2 = 0
    math.floorMod(h1 + row * h2, width)
  }

  def serialize(s: State): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * s.counters.length)
    bb.putInt(s.depth)
    bb.putInt(s.width)
    s.counters.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getInt(), bb.getInt())
    var i = 0
    while (i < s.counters.length) { s.counters(i) = bb.getLong(); i += 1 }
    s
  }

  /** Point-frequency estimate: min over rows (never undercounts). A
    * depth-0 sketch (the neutral state a merge over an empty or all-null
    * group serializes) has observed nothing — estimate 0, not the
    * Long.MaxValue an empty min-fold would leave.
    */
  def estimate(bytes: Array[Byte], value: UTF8String): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt(); val width = bb.getInt()
    if (depth == 0) return 0L
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = bb.getLong(8 + 8 * (r * width + rowIndex(value, r, width)))
      if (c < best) best = c
      r += 1
    }
    best
  }

  // ---------- column surface ----------

  def agg(value: Column, depth: Int = 5, width: Int = 8192): Column =
    GraftBridge.column(CmsAgg(GraftBridge.expression(value), depth, width)
      .toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    GraftBridge.column(CmsMergeAgg(GraftBridge.expression(sketch))
      .toAggregateExpression())

  def estimateCol(sketch: Column, value: Column): Column =
    GraftBridge.column(CmsEstimate(
      GraftBridge.expression(sketch), GraftBridge.expression(value)))
}

/** `cms_agg(value, depth, width)` -> binary sketch (value stringified,
  * matching [[KmvAgg]]'s any-type handling).
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CountMinSketch.State] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType | _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_agg expects string or numeric, got $other")
    }

  override def createAggregationBuffer(): CountMinSketch.State =
    new CountMinSketch.State(depth, width)

  override def update(
      b: CountMinSketch.State, input: InternalRow): CountMinSketch.State = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u
        case other         => UTF8String.fromString(other.toString)
      }
      b.add(s)
    }
    b
  }

  override def merge(
      b: CountMinSketch.State, o: CountMinSketch.State): CountMinSketch.State = {
    b.mergeFrom(o); b
  }

  override def eval(b: CountMinSketch.State): Any = CountMinSketch.serialize(b)
  override def serialize(b: CountMinSketch.State): Array[Byte] =
    CountMinSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): CountMinSketch.State =
    CountMinSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(child = c.head)
}

/** `cms_merge_agg(sketch)` -> binary sketch (exact additive union). */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CountMinSketch.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_merge_agg expects binary sketches, got $other")
    }

  // shape adopted lazily from the first real sketch: depth 0 marks the
  // neutral element (counters empty, merges into anything)
  override def createAggregationBuffer(): CountMinSketch.State =
    new CountMinSketch.State(0, 0)

  private def absorb(
      b: CountMinSketch.State, o: CountMinSketch.State): CountMinSketch.State =
    if (o.depth == 0) b
    else if (b.depth == 0) o
    else { b.mergeFrom(o); b }

  override def update(
      b: CountMinSketch.State, input: InternalRow): CountMinSketch.State = {
    val v = child.eval(input)
    if (v == null) b
    else absorb(b, CountMinSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(
      b: CountMinSketch.State, o: CountMinSketch.State): CountMinSketch.State =
    absorb(b, o)

  override def eval(b: CountMinSketch.State): Any = CountMinSketch.serialize(b)
  override def serialize(b: CountMinSketch.State): Array[Byte] =
    CountMinSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): CountMinSketch.State =
    CountMinSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** `cms_estimate(sketch, value)` -> long point-frequency estimate. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate expects (binary sketch, string value), got $other")
    }
  override def nullSafeEval(sketch: Any, value: Any): Any =
    CountMinSketch.estimate(
      sketch.asInstanceOf[Array[Byte]], value.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.CountMinSketch.estimate($s, $v)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}
