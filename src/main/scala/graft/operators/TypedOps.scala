package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Typed Dataset[T] surface (SURVEY §1.1 "Dataset[T] with case-class
  * Encoders where type safety helps"): the same engine operators driven
  * through compile-time-checked lambdas and a custom typed
  * [[Aggregator]], with their scale behavior made explicit.
  *
  * Typed lambdas are opaque to Catalyst (no pushdown through a
  * `filter(f: T => Boolean)`), so the declared queries keep lambdas off
  * the scan path: the scan-level filter is a Column (pushed down), typed
  * code runs after. `reduceGroups` and `Aggregator` both merge partially
  * per partition before the shuffle — the typed equivalents of
  * map-side-combine — unlike `mapGroups`, which ships every row.
  */
object TypedOps {

  type Q = (SparkSession, String) => DataFrame

  case class Line(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  /** Geometric mean as a typed Aggregator: exp(mean(ln x)) — the
    * numerically-stable product mean. Buffer is a product type, so the
    * encoder is flat (two doubles), and merge is associative —
    * partial-aggregated map-side like any builtin.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** [[GeoMean]] adapted to Line input so it composes with other typed
    * aggregates over the same groupByKey (Aggregator has no contramap).
    */
  object GeoMeanPrice extends Aggregator[Line, (Double, Long), Double] {
    override def zero: (Double, Long) = GeoMean.zero
    override def reduce(b: (Double, Long), l: Line): (Double, Long) =
      GeoMean.reduce(b, l.l_extendedprice)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      GeoMean.merge(a, b)
    override def finish(b: (Double, Long)): Double = GeoMean.finish(b)
    override def bufferEncoder: Encoder[(Double, Long)] = GeoMean.bufferEncoder
    override def outputEncoder: Encoder[Double] = GeoMean.outputEncoder
  }

  /** Typed quantity sum — the Aggregator shape of a reduceGroups fold,
    * composable with other typed aggregates in ONE groupByKey pass.
    */
  object SumQty extends Aggregator[Line, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, l: Line): Double = b + l.l_quantity
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(b: Double): Double = b
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed pipeline: Column filter at the scan (pushdown preserved),
    * case-class Dataset after, BOTH typed aggregates in one
    * groupByKey.agg — one scan, one shuffle (two groupByKey passes +
    * a join would double the scan for no semantic gain; `reduceGroups`
    * is the same partial-merge machinery, pinned in TypedOpsSpec).
    */
  def typedFlagProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val s = spark
    import s.implicits._
    Tables(spark, sfDir).lineitem
      .where(col("l_quantity") > 30) // Column filter -> parquet pushdown
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[Line]
      .groupByKey(_.l_returnflag)
      .agg(
        SumQty.toColumn.name("sum_qty"),
        GeoMeanPrice.toColumn.name("geo"))
      .toDF("l_returnflag", "sum_qty", "geo_price")
      .select(
        col("l_returnflag"),
        round(col("sum_qty"), 2).as("sum_qty"),
        round(col("geo_price"), 4).as("geo_price"))
      .orderBy(col("l_returnflag"))
  }

  def queries: Map[String, Q] = Map(
    "q_typed_agg" -> (typedFlagProfile _)
  )

  def oracles: Map[String, String] = Map(
    // quantities are integral doubles, so the typed reduce's float sum is
    // order-insensitive (exact); the geometric mean mirrors exp(avg(ln)).
    "q_typed_agg" ->
      """SELECT l_returnflag,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(exp(avg(ln(l_extendedprice))), 4) AS geo_price
        |FROM lineitem WHERE l_quantity > 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
