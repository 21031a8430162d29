package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve values for multi-dimensional clustering — the
  * real bit-interleave behind Delta's `OPTIMIZE ... ZORDER BY`
  * (00-etl-rwd.py:213,217), as opposed to [[LakeTable.optimize]]'s linear
  * `repartitionByRange` clustering which favors the leading column only.
  *
  * Each column is min/max-scaled to a `bits`-bit integer rank, then the
  * ranks' bits are interleaved: bit i of column j lands at position
  * i*k + j of the z-value. Sorting by z-value groups rows into 2^k-ary
  * spatial tiles, so parquet min/max stats prune row groups for
  * predicates on ANY clustered dimension, not just the first.
  *
  * Everything is built from codegen'd bitwise built-ins (shift/and/or) —
  * no UDF, no custom expression — and the per-column min/max travels as a
  * 1-row broadcast aggregate, so the whole thing is one extra pass and
  * zero driver actions.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative long
    * columns. With k columns the result uses k*bits bits (k*bits <= 63).
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.length * bits <= 63,
      s"${cols.length} cols x $bits bits exceeds a long")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * cols.length + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Append a z-value column over numeric columns. NULLs rank lowest (0).
    *
    * @param bits per-dimension resolution; 16 bits = 65,536 ranks per
    *             dimension, ample for file/row-group tiling
    */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16,
      zCol: String = "__z"
  ): DataFrame =
    withCurveValue(df, cols, bits, zCol, scaled => interleave(scaled, bits))

  /** Append a Hilbert-curve value column over numeric columns — same
    * min/max rank scaling as [[withZValue]], combined through
    * [[graft.functions.Hilbert.hilbertIndex]] instead of the Morton
    * interleave. Consecutive curve positions are grid-adjacent, so sorted
    * file spans tile more compactly than Z-order's diagonal jumps.
    */
  def withHilbertValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16,
      hCol: String = "__h"
  ): DataFrame =
    withCurveValue(df, cols, bits, hCol,
      scaled => graft.functions.Hilbert.hilbertIndex(scaled, bits))

  /** Order-preserving numeric key for one clustered dimension. Numerics
    * cast straight to double; STRINGS map through their first 6 UTF-8
    * bytes, right-padded with 0x00 and read big-endian — binary-collation
    * order-preserving ("ab" sorts before "b" and 0x6162… < 0x62…), and 48
    * bits stays EXACT in a double's 53-bit mantissa (7 bytes would round
    * and could swap near-equal prefixes). Six bytes of prefix resolution
    * is far above the `bits`-bit rank the scaling collapses to anyway.
    */
  private def curveKey(c: String, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.StringType =>
        expr(s"cast(conv(hex(rpad(substring(encode(`$c`, 'utf-8'), 1, 6), 6, x'00')), " +
          "16, 10) as double)")
      case _ => col(c).cast("double")
    }

  /** Shared scaling stage: min/max-rank each column to `bits` bits (1-row
    * broadcast stats, no driver action), then combine ranks into a single
    * curve value with `combine`. String dimensions cluster through
    * [[curveKey]]'s prefix rank, so `OPTIMIZE … ZORDER BY (category, ts)`
    * works on mixed string/numeric column sets like Delta's does.
    */
  private def withCurveValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      outCol: String,
      combine: Seq[Column] => Column
  ): DataFrame = {
    val maxRank = (1L << bits) - 1
    val keys = cols.map(c => c -> curveKey(c, df.schema(c).dataType)).toMap
    val statCols = cols.flatMap(c => Seq(
      min(keys(c)).as(s"__zmin_$c"),
      max(keys(c)).as(s"__zmax_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val scaled = cols.map { c =>
      val mn = col(s"__zmin_$c")
      val range = greatest(col(s"__zmax_$c") - mn, lit(Double.MinPositiveValue))
      coalesce(
        least(
          ((keys(c) - mn) / range * maxRank).cast("long"),
          lit(maxRank)),
        lit(0L))
    }
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, combine(scaled))
      .drop(cols.flatMap(c => Seq(s"__zmin_$c", s"__zmax_$c")): _*)
  }
}
