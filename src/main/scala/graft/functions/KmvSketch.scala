package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002; the Theta
  * sketch family, Dasgupta et al.) — the SET-OPERATION half of the
  * sketch toolbox: HLL ([[graft.analytics.Sketches]]) unions, but cannot
  * INTERSECT; a KMV sketch supports both, so "distinct users in segment A
  * ∩ segment B" runs on two stored kilobyte sketches instead of a
  * distinct-join over raw history.
  *
  * Mechanics: keep the k smallest 64-bit hashes of the distinct values.
  * With θ = (k-th smallest hash as a fraction of hash space), the
  * estimate is (k-1)/θ (unbiased). Union = merge, keep k smallest.
  * Intersection: over the COMBINED θ (the smaller of the two sketches'
  * thresholds), every surviving hash is a uniform sample of the union —
  * count the sampled hashes present in both, scale by 1/θ. Relative
  * error ~ 1/sqrt(k): k=1024 gives ~3%.
  *
  * Storage: sorted long array, ≤ 8k bytes — a lake-storable binary value
  * like the t-digest, mergeable across days/sources/partitions.
  */
object KmvSketch {

  /** Buffer: bounded max-heap of the k smallest hashes seen. */
  final class State(var k: Int) {
    // max-heap so the largest of the kept k is evictable in O(log k)
    val heap: mutable.PriorityQueue[Long] = mutable.PriorityQueue.empty[Long]
    val present: mutable.HashSet[Long] = mutable.HashSet.empty

    /** Union semantics require the COARSEST precision of the inputs: a
      * merged sketch may keep no more than the smallest participating k,
      * or its θ would lie. Evicts down when shrinking.
      */
    def shrinkTo(nk: Int): Unit =
      if (nk < k) {
        k = nk
        while (heap.size > k) present -= heap.dequeue()
      }

    def add(h: Long): Unit = {
      if (present.contains(h)) return
      if (heap.size < k) { heap.enqueue(h); present += h }
      else if (h < heap.head) {
        present -= heap.dequeue()
        heap.enqueue(h); present += h
      }
    }

    def sortedHashes: Array[Long] = heap.toArray.sorted
  }

  /** Stable 64-bit hash of the value's string form (engine-side only;
    * never compared across engines). xxhash-style avalanche over UTF-8
    * bytes, mapped to NON-NEGATIVE space so θ arithmetic stays simple.
    */
  def hash64(s: UTF8String): Long = {
    var h = 0x9E3779B97F4A7C15L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xFFL
      h *= 0xC2B2AE3D27D4EB4FL
      h = java.lang.Long.rotateLeft(h, 31)
      i += 1
    }
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h & Long.MaxValue // non-negative
  }

  def serialize(s: State): Array[Byte] = {
    val hs = s.sortedHashes
    val bb = ByteBuffer.allocate(8 + 8 * hs.length)
    bb.putInt(s.k)
    bb.putInt(hs.length)
    hs.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  private def theta(hashes: Array[Long], k: Int): Double =
    if (hashes.length < k) 1.0
    else (hashes.last.toDouble + 1) / (Long.MaxValue.toDouble + 1)

  /** Distinct estimate from one sketch. Exact while under k values. */
  def estimate(bytes: Array[Byte]): Double = {
    val s = deserialize(bytes)
    val hs = s.sortedHashes
    if (hs.length < s.k) hs.length.toDouble
    else (s.k - 1).toDouble / theta(hs, s.k)
  }

  /** |A ∩ B| estimate: sample = hashes below the combined θ; count those
    * in both, scale by 1/θ.
    */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val sa = deserialize(a); val sb = deserialize(b)
    val ha = sa.sortedHashes; val hb = sb.sortedHashes
    val th = math.min(theta(ha, sa.k), theta(hb, sb.k))
    val cut = (th * (Long.MaxValue.toDouble + 1)).toLong
    val setB = hb.takeWhile(_ < cut).toSet
    val both = ha.takeWhile(_ < cut).count(setB.contains)
    if (th >= 1.0) both.toDouble else both.toDouble / th
  }

  // ---------- column surface ----------

  def agg(value: Column, k: Int = 1024): Column =
    GraftBridge.column(KmvAgg(GraftBridge.expression(value), k)
      .toAggregateExpression())

  def unionAgg(sketch: Column): Column =
    GraftBridge.column(KmvUnionAgg(GraftBridge.expression(sketch))
      .toAggregateExpression())

  def estimateCol(sketch: Column): Column =
    GraftBridge.column(KmvEstimate(GraftBridge.expression(sketch)))

  def intersectCol(a: Column, b: Column): Column =
    GraftBridge.column(KmvIntersect(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** `kmv_agg(value, k)` -> binary sketch (value stringified, like
  * `hll_sketch_agg`'s any-type handling via cast upstream).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvSketch.State] {

  require(k >= 16, s"k must be >= 16, got $k")

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
          s"kmv_agg expects string or numeric, got $other")
    }

  override def createAggregationBuffer(): KmvSketch.State = new KmvSketch.State(k)

  override def update(b: KmvSketch.State, input: InternalRow): KmvSketch.State = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u
        case other         => UTF8String.fromString(other.toString)
      }
      b.add(KmvSketch.hash64(s))
    }
    b
  }

  override def merge(b: KmvSketch.State, o: KmvSketch.State): KmvSketch.State = {
    o.sortedHashes.foreach(b.add)
    b
  }

  override def eval(b: KmvSketch.State): Any = KmvSketch.serialize(b)
  override def serialize(b: KmvSketch.State): Array[Byte] = KmvSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): KmvSketch.State =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(child = c.head)
}

/** `kmv_union_agg(sketch)` -> binary sketch. */
case class KmvUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvSketch.State] {

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
          s"kmv_union_agg expects binary sketches, got $other")
    }

  // neutral element: unbounded until the first real sketch shrinks it to
  // its own k (shrinkTo in update/merge), so union never degrades below
  // the coarsest participating sketch
  override def createAggregationBuffer(): KmvSketch.State =
    new KmvSketch.State(Int.MaxValue)

  override def update(b: KmvSketch.State, input: InternalRow): KmvSketch.State = {
    val v = child.eval(input)
    if (v == null) return b
    val o = KmvSketch.deserialize(v.asInstanceOf[Array[Byte]])
    b.shrinkTo(o.k)
    o.sortedHashes.foreach(b.add)
    b
  }

  override def merge(b: KmvSketch.State, o: KmvSketch.State): KmvSketch.State = {
    b.shrinkTo(o.k)
    o.sortedHashes.foreach(b.add)
    b
  }

  override def eval(b: KmvSketch.State): Any = KmvSketch.serialize(b)
  override def serialize(b: KmvSketch.State): Array[Byte] = KmvSketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): KmvSketch.State =
    KmvSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = c.head)
}

/** `kmv_estimate(sketch)` -> double distinct estimate. */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_estimate expects a binary sketch, got $other")
    }
  override def nullSafeEval(bytes: Any): Any =
    KmvSketch.estimate(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvSketch.estimate($c)")
  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
}

/** `kmv_intersect(a, b)` -> double |A ∩ B| estimate. */
case class KmvIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_intersect expects two binary sketches, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.KmvSketch.intersectEstimate($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvIntersect = copy(left = l, right = r)
}
