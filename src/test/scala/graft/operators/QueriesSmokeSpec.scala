package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t1 smoke (SURVEY §5.2): every declared query executes at sf0.001 and
  * returns a sane shape; every oracle key corresponds to a query.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001 with nonempty schema") {
      val df = fn(spark, sf0001)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("queries needing signal are nonempty at sf0.001") {
    val mustBeNonEmpty = Seq(
      "q1_pricing_summary", "q_project_arith", "q_like_lower",
      "q_join_star_revenue", "q_join_left_anti", "q_except",
      "q_window_trailing", "q_json_props"
    )
    mustBeNonEmpty.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sf0001).count() > 0, s"$n empty")
    }
  }
}
