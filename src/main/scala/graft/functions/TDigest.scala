package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests") as a first-class MERGEABLE quantile
  * sketch — the standing-artifact quantile path Spark's built-ins lack:
  * `percentile` buffers every value per group, and `approx_percentile`'s
  * internal summary is opaque (it cannot be stored, shipped, or unioned
  * across jobs). This digest is a BINARY value like the DataSketches HLL
  * family ([[graft.analytics.Sketches]]): day-level digests persist to a
  * lake table and union into month/corpus quantiles without re-scanning
  * history, carrying O(δ) centroids however many rows flowed in.
  *
  * Size bound: a cluster centered at quantile q may hold at most
  * `4·n·q(1-q)/δ` weight — tight at the tails (where quantile accuracy
  * matters), loose in the middle, ≤ O(δ) clusters total. Estimates
  * interpolate between centroid means at their cumulative-weight
  * midpoints. Accuracy is order/partitioning-dependent BY DESIGN, so the
  * declared query oracles exact values plus an error-bound boolean (the
  * HLL row's contract), and the spec pins mergeability: union-of-partial
  * digests answers within the same bound as one big digest.
  */
object TDigest {

  /** Mutable digest state: compressed centroids + an uncompressed tail
    * buffer (amortizes the sort: compression runs once per ~8δ inserts,
    * not per row).
    */
  final class State(val delta: Double) {
    var centroids: Array[(Double, Double)] = Array.empty // (mean, weight), sorted
    val buffer: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

    def add(value: Double, weight: Double = 1.0): Unit = {
      buffer += ((value, weight))
      if (buffer.length >= (8 * delta).toInt) compress()
    }

    def compress(): Unit = {
      if (buffer.isEmpty) return
      centroids = TDigest.compress(centroids ++ buffer, delta)
      buffer.clear()
    }
  }

  /** One merge-compress pass over mean-sorted centroids. */
  private[functions] def compress(
      cs: Seq[(Double, Double)], delta: Double): Array[(Double, Double)] = {
    if (cs.length <= 1) return cs.toArray
    val sorted = cs.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    val out = ArrayBuffer.empty[(Double, Double)]
    var (curM, curW) = sorted.head
    var cum = 0.0 // weight strictly before the current cluster
    sorted.iterator.drop(1).foreach { case (m, w) =>
      val q = (cum + curW / 2) / n
      val limit = 4.0 * n * q * (1.0 - q) / delta
      if (curW + w <= limit) {
        // weighted-mean merge keeps the cluster centroid exact
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        out += ((curM, curW)); cum += curW
        curM = m; curW = w
      }
    }
    out += ((curM, curW))
    out.toArray
  }

  /** value at quantile `q` (0..1) by midpoint interpolation; NaN on an
    * empty digest.
    */
  def quantile(centroids: Array[(Double, Double)], q: Double): Double = {
    if (centroids.isEmpty) return Double.NaN
    if (centroids.length == 1) return centroids(0)._1
    val n = centroids.map(_._2).sum
    val target = q * n
    var cum = 0.0
    var i = 0
    // centroid i's mass is centered at cum + w/2
    while (i < centroids.length) {
      val (m, w) = centroids(i)
      val mid = cum + w / 2
      if (target <= mid) {
        if (i == 0) return m
        val (pm, pw) = centroids(i - 1)
        val pmid = cum - pw / 2
        val frac = (target - pmid) / (mid - pmid)
        return pm + (m - pm) * math.max(0.0, math.min(1.0, frac))
      }
      cum += w
      i += 1
    }
    centroids.last._1
  }

  // ---------- binary codec (the lake-storable sketch value) ----------

  def serialize(s: State): Array[Byte] = {
    s.compress()
    val bb = ByteBuffer.allocate(12 + 16 * s.centroids.length)
    bb.putDouble(s.delta)
    bb.putInt(s.centroids.length)
    s.centroids.foreach { case (m, w) => bb.putDouble(m); bb.putDouble(w) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getDouble())
    val n = bb.getInt()
    s.centroids = Array.fill(n)((bb.getDouble(), bb.getDouble()))
    s
  }

  /** Static entry for the scalar expression's codegen. */
  def quantileOf(bytes: Array[Byte], q: Double): Double =
    quantile(deserialize(bytes).centroids, q)

  // ---------- column surface ----------

  /** Aggregate a double column into a binary t-digest. */
  def agg(value: Column, compression: Int = 100): Column =
    GraftBridge.column(TDigestAgg(GraftBridge.expression(value), compression)
      .toAggregateExpression())

  /** Union partial digests (a binary column of digests) into one. */
  def unionAgg(sketch: Column): Column =
    GraftBridge.column(TDigestUnionAgg(GraftBridge.expression(sketch))
      .toAggregateExpression())

  /** Quantile estimate from a digest value. */
  def quantileCol(sketch: Column, q: Double): Column =
    GraftBridge.column(TDigestQuantile(GraftBridge.expression(sketch), q))
}

/** `tdigest_agg(value, δ)` -> binary digest. */
case class TDigestAgg(
    child: Expression,
    compression: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TDigest.State] {

  require(compression >= 10, s"compression must be >= 10, got $compression")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tdigest_agg expects a numeric column, got $other")
    }

  override def createAggregationBuffer(): TDigest.State =
    new TDigest.State(compression.toDouble)

  override def update(b: TDigest.State, input: InternalRow): TDigest.State = {
    child.eval(input) match {
      case null                     => ()
      case d: java.lang.Double      => b.add(d.doubleValue)
      case f: java.lang.Float       => b.add(f.toDouble)
      case i: java.lang.Integer     => b.add(i.toDouble)
      case l: java.lang.Long        => b.add(l.toDouble)
      case s: java.lang.Short       => b.add(s.toDouble)
      case by: java.lang.Byte       => b.add(by.toDouble)
      case dec: org.apache.spark.sql.types.Decimal => b.add(dec.toDouble)
      case other => throw new IllegalStateException(
        s"tdigest_agg: unexpected value $other")
    }
    b
  }

  override def merge(b: TDigest.State, o: TDigest.State): TDigest.State = {
    o.compress()
    o.centroids.foreach { case (m, w) => b.add(m, w) }
    b
  }

  override def eval(b: TDigest.State): Any = TDigest.serialize(b)
  override def serialize(b: TDigest.State): Array[Byte] = TDigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): TDigest.State =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TDigestAgg = copy(child = c.head)
}

/** `tdigest_union_agg(sketch)` -> binary digest (rollup across partials). */
case class TDigestUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TDigest.State] {

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
          s"tdigest_union_agg expects binary digests, got $other")
    }

  // the first merged-in digest decides δ; a fresh buffer is a neutral
  // element with the default compression
  override def createAggregationBuffer(): TDigest.State = new TDigest.State(100.0)

  override def update(b: TDigest.State, input: InternalRow): TDigest.State = {
    val v = child.eval(input)
    if (v == null) return b
    val other = TDigest.deserialize(v.asInstanceOf[Array[Byte]])
    other.centroids.foreach { case (m, w) => b.add(m, w) }
    b
  }

  override def merge(b: TDigest.State, o: TDigest.State): TDigest.State = {
    o.compress()
    o.centroids.foreach { case (m, w) => b.add(m, w) }
    b
  }

  override def eval(b: TDigest.State): Any = TDigest.serialize(b)
  override def serialize(b: TDigest.State): Array[Byte] = TDigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): TDigest.State =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TDigestUnionAgg = copy(child = c.head)
}

/** `tdigest_quantile(sketch, q)` -> double. */
case class TDigestQuantile(child: Expression, q: Double)
    extends UnaryExpression {

  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tdigest_quantile expects a binary digest, got $other")
    }

  override def nullSafeEval(bytes: Any): Any =
    TDigest.quantileOf(bytes.asInstanceOf[Array[Byte]], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TDigest.quantileOf($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): TDigestQuantile =
    copy(child = newChild)
}
