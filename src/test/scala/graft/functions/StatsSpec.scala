package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the chi-square survival function against published critical
  * values (Abramowitz & Stegun table 26.8) and closed forms — the DuckDB
  * oracle only covers even dof, so odd dof is pinned here.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("p-value matches published chi-square critical values") {
    // upper 5% critical values: P[X >= x] = 0.05
    assert(math.abs(Stats.chiSqSurvival(3.841458820694124, 1) - 0.05) < 1e-12)
    assert(math.abs(Stats.chiSqSurvival(5.991464547107979, 2) - 0.05) < 1e-12)
    assert(math.abs(Stats.chiSqSurvival(9.487729036781154, 4) - 0.05) < 1e-12)
    // upper 1%
    assert(math.abs(Stats.chiSqSurvival(6.634896601021213, 1) - 0.01) < 1e-12)
  }

  test("even dof matches the closed form Q(x;2m) = exp(-x/2) * sum (x/2)^j/j!") {
    // dof=2: Q = exp(-x/2)
    assert(math.abs(Stats.chiSqSurvival(2.0, 2) - math.exp(-1.0)) < 1e-14)
    // dof=4: Q = exp(-x/2) * (1 + x/2), also deep in the tail
    assert(math.abs(Stats.chiSqSurvival(50.0, 4) - math.exp(-25.0) * 26.0) < 1e-18)
  }

  test("odd dof=1 matches erfc(sqrt(x/2))") {
    // Q(x;1) = erfc(sqrt(x/2)); erfc(1/sqrt(2)) = 0.31731050786291415
    assert(math.abs(Stats.chiSqSurvival(1.0, 1) - 0.31731050786291415) < 1e-12)
  }

  test("edge cases: chi2<=0 -> 1, dof<=0 -> NaN") {
    assert(Stats.chiSqSurvival(0.0, 3) === 1.0)
    assert(Stats.chiSqSurvival(-1.0, 3) === 1.0)
    assert(Stats.chiSqSurvival(5.0, 0).isNaN)
  }

  test("column form evaluates through the Catalyst expression") {
    val r = Seq((3.841458820694124, 1L)).toDF("chi2", "dof")
      .select(Stats.chiSqPValue(col("chi2"), col("dof")).as("p")).head
    assert(math.abs(r.getDouble(0) - 0.05) < 1e-12)
    // null propagation
    val n = Seq((Option.empty[Double], 1L)).toDF("chi2", "dof")
      .select(Stats.chiSqPValue(col("chi2"), col("dof"))).head
    assert(n.isNullAt(0))
  }
}
