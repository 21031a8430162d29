package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    ("a", 10L, "r1"), ("a", 20L, "r2"), ("b", 15L, "r3")
  ).toDF("k", "t", "v")

  private def join(left: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).getOrElse("-")))

  test("picks the latest right row at or before the left time") {
    val left = Seq(("a", 25L), ("a", 12L), ("b", 100L)).toDF("k", "t")
    assert(join(left).toSeq === Seq(("a", 12L, "r1"), ("a", 25L, "r2"), ("b", 100L, "r3")))
  }

  test("equal timestamps match inclusively") {
    val left = Seq(("a", 20L)).toDF("k", "t")
    assert(join(left).toSeq === Seq(("a", 20L, "r2")))
  }

  test("left rows before any right row carry null") {
    val left = Seq(("a", 5L), ("c", 50L)).toDF("k", "t")
    assert(join(left).toSeq === Seq(("a", 5L, "-"), ("c", 50L, "-")))
  }

  test("a NULL carry value on the latest right row is carried as NULL, not a stale value") {
    val r = Seq(
      ("a", 10L, Some("old"), Some("x1")),
      ("a", 20L, None, Some("x2"))
    ).toDF("k", "t", "v", "w")
    val l = Seq(("a", 25L)).toDF("k", "t")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v", "w")).head
    // the t=20 row is the as-of match: v must be NULL (not "old"), and v/w
    // must come from the SAME row (not v from t=10 with w from t=20)
    assert(out.isNullAt(2), s"stale carry leaked: $out")
    assert(out.getString(3) === "x2")
  }

  test("NULL join keys never match — not even other NULL-key rows") {
    val r = Seq(
      (Option("a"), 10L, "ra"), (Option.empty[String], 5L, "rnull")
    ).toDF("k", "t", "v")
    val l = Seq(
      (Option("a"), 25L), (Option.empty[String], 25L)
    ).toDF("k", "t")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
      .collect()
      .map(row => (Option(row.getString(0)), Option(row.getString(2))))
      .toSet
    // the null-key left row surfaces exactly once, with NULL carry — it
    // must NOT pick up "rnull" via a shared null window partition
    assert(out === Set((Some("a"), Some("ra")), (None, None)), s"got $out")
  }

  test("forward direction picks the earliest right row at or after the left time") {
    val left = Seq(("a", 12L), ("a", 20L), ("a", 25L), ("b", 100L)).toDF("k", "t")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"), forward = true)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).getOrElse("-")))
    // t=12 -> next is r2@20; t=20 matches inclusively; t=25/b@100 -> none
    assert(out.toSeq === Seq(("a", 12L, "r2"), ("a", 20L, "r2"), ("a", 25L, "-"), ("b", 100L, "-")))
  }

  test("tolerance nulls out matches farther than the bound") {
    val left = Seq(("a", 11L), ("a", 30L)).toDF("k", "t")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      tolerance = Some(org.apache.spark.sql.functions.lit(5L)))
      .orderBy("t").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)).getOrElse("-")))
    // t=11: r1@10 is 1 away -> kept; t=30: r2@20 is 10 away -> dropped
    assert(out.toSeq === Seq((11L, "r1"), (30L, "-")))
  }

  test("rejects carry column collisions") {
    val left = Seq(("a", 5L, "x")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
    }
  }
}
