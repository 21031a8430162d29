package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters over a string column as a
  * `TypedImperativeAggregate` — approximate top-k with a HARD guarantee:
  * every item whose true frequency exceeds N/(k+1) is present in the
  * summary, and each reported count under-estimates the true count by at
  * most N/(k+1), regardless of data order or partitioning (Misra & Gries
  * 1982; mergeability per Agarwal et al., PODS'12). Spark 4.1 has no
  * built-in frequent-items aggregate (`count_min_sketch` returns opaque
  * bytes and `stat.freqItems` is not an aggregate function), so this is a
  * genuine extension, not a UDF-where-builtin-exists.
  *
  * Scale shape: the buffer is AT MOST k counters however large the input
  * — the shuffle carries one k-entry summary per group, not rows, and
  * partials combine map-side like any built-in aggregate. That makes it
  * the 100 TB answer to "top tokens per corpus slice" where an exact
  * groupBy would shuffle every distinct token.
  *
  * Result: `array<struct<item string, est bigint>>` sorted by estimated
  * count desc, item asc. Estimates are lower bounds; membership of true
  * heavy hitters is the deterministic part (what the declared query
  * oracles), counts are the approximate part.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"frequent_items expects string, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      b: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return b // nulls don't count, like count(col)
    // copy out of the (possibly reused) UnsafeRow backing memory
    val item = v.asInstanceOf[UTF8String].toString
    b.get(item) match {
      case Some(c) => b.update(item, c + 1)
      case None if b.size < k => b.update(item, 1L)
      case None =>
        // classic MG decrement step: k+1 distinct items cancel one count
        // each. O(k) here, but it fires at most N/(k+1) times total, so
        // the aggregate stays O(N) overall.
        val dead = mutable.ArrayBuffer.empty[String]
        b.mapValuesInPlace((_, c) => c - 1)
        b.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(
      b: mutable.HashMap[String, Long],
      o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    o.foreach { case (i, c) => b.update(i, b.getOrElse(i, 0L) + c) }
    if (b.size > k) {
      // Agarwal et al.: subtract the (k+1)-th largest count from all —
      // keeps <= k counters and preserves the N/(k+1) error bound
      val cut = b.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b.mapValuesInPlace((_, c) => c - cut)
      b.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    val sorted = b.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c): Any
    })
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = b.toArray
    val bytes = items.map { case (i, _) => i.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { ix =>
      bb.putInt(bytes(ix).length)
      bb.put(bytes(ix))
      bb.putLong(items(ix)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = mutable.HashMap.empty[String, Long]
    var ix = 0
    while (ix < n) {
      val len = bb.getInt()
      val raw = new Array[Byte](len)
      bb.get(raw)
      b.update(new String(raw, StandardCharsets.UTF_8), bb.getLong())
      ix += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItems =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItems =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object FrequentItems {
  /** frequent_items(col, k) as a Column aggregate. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      FrequentItems(GraftBridge.expression(c), k).toAggregateExpression())
}
