package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class TypedOpsSpec extends SparkSpec {

  test("reduceGroups fold equals the Aggregator sum (same partial-merge machinery)") {
    val s = spark
    import s.implicits._
    val lines = Tables(spark, sf0001).lineitem
      .where(col("l_quantity") > 30)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[TypedOps.Line]
    val viaReduce = lines
      .map(l => (l.l_returnflag, l.l_quantity))
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, a._2 + b._2))
      .map { case (flag, (_, qty)) => (flag, qty) }
      .collect().toMap
    val viaAgg = TypedOps.typedFlagProfile(spark, sf0001)
      .select(col("l_returnflag"), col("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaReduce.keySet == viaAgg.keySet)
    viaReduce.foreach { case (k, v) =>
      assert(math.abs(v - viaAgg(k)) < 1e-6, s"$k: $v != ${viaAgg(k)}")
    }
  }

  test("geometric mean aggregator: closed form on a tiny dataset") {
    val s = spark
    import s.implicits._
    val ds = Seq(2.0, 8.0).toDS()
    val got = ds.groupByKey(_ => 1).agg(TypedOps.GeoMean.toColumn).head()._2
    assert(math.abs(got - 4.0) < 1e-12) // sqrt(2*8)
  }
}
