package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting for hot join keys (the manual fallback when AQE's runtime
  * skew-join split isn't enough — e.g. a single key holding >1/32 of a
  * 100 TB fact table).
  *
  * The fact side gets a deterministic per-row salt in [0, saltFactor);
  * the (smaller) dimension side is replicated saltFactor times; the join
  * key becomes (key, salt), spreading each hot key over saltFactor
  * reducers. Result is bag-equal to the unsalted join (SkewSpec).
  */
object Skew {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltFactor: Int
  ): DataFrame = {
    // salt derived from the whole fact row: deterministic, uniform
    val salted = fact.withColumn(
      "__salt",
      pmod(abs(hash(struct(fact.columns.map(col): _*))), lit(saltFactor)))
    val replicated = dim.withColumn(
      "__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated,
        col(factKey) === col(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
