package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a hand-checkable graph matches the closed iteration") {
    // star: 1,2,3 all point at 0; 0 points at 1. Hand-iterate 2 rounds.
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 4.0; val d = 0.85
    // round 1 from uniform 1/4
    val r0 = (1 - d) / n + d * (3 * 0.25) // node 0 gets 1,2,3's full rank
    val r1 = (1 - d) / n + d * 0.25 // node 1 gets 0's rank
    val rLeaf = (1 - d) / n // 2,3 get nothing
    // round 2
    val e0 = (1 - d) / n + d * (r1 + 2 * rLeaf)
    val e1 = (1 - d) / n + d * r0
    assert(math.abs(pr(0L) - e0) < 1e-12, s"${pr(0L)} vs $e0")
    assert(math.abs(pr(1L) - e1) < 1e-12)
    assert(math.abs(pr(2L) - (1 - d) / n) < 1e-12)
  }

  test("rank mass is conserved up to dangling leak; more in-links, more rank") {
    val pr = Graph.pageRank(
      Seq((1L, 2L), (3L, 2L), (4L, 2L), (2L, 1L), (4L, 1L)).toDF("src", "dst"),
      iterations = 8).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 1 and 2 trade rank in a period-2 cycle (not yet damped at 8
    // iterations), but both dominate the leaf senders at any iteration
    assert(pr(2L) > pr(3L) && pr(1L) > pr(3L) && pr(2L) > pr(4L))
    // every node has out-edges -> no dangling leak: mass stays ~1
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("pageRank iterations reuse the pre-partitioned edge layout (no per-round edge shuffle)") {
    // localCheckpoint preserves physical partitioning, so the per-round
    // contribution join must NOT re-shuffle the (big) edge side — only
    // rank/contribution exchanges belong in the iterated plan
    val edges = (1L to 400L)
      .map(i => (i % 40, (i * 7) % 40)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iterations = 4)
    pr.collect(): Unit // finalize AQE
    val plan = pr.queryExecution.executedPlan.toString
    val srcExchanges =
      "hashpartitioning\\(src".r.findAllIn(plan).length
    // before pre-partitioning this was one src-keyed Exchange PER
    // ITERATION (4 here); the pre-partitioned checkpoint leaves none in
    // the iterated plan (the one real shuffle happened before the
    // checkpoint and is not part of this plan)
    assert(srcExchanges === 0,
      s"expected no per-iteration src shuffles, found $srcExchanges in:\n$plan")
  }

  test("triangleCount is exact on known shapes") {
    def tri(edges: Seq[(Long, Long)]): Long =
      Graph.triangleCount(edges.toDF("src", "dst")).head.getLong(0)
    // one triangle, arbitrary orientations + a duplicate + a dangling edge
    assert(tri(Seq((1L, 2L), (3L, 2L), (1L, 3L), (2L, 1L), (3L, 4L))) === 1L)
    // K4 has 4 triangles
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(tri(k4) === 4L)
    // a square (no chord) has none
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === 0L)
  }

  test("declared queries run at sf0.001") {
    assert(Graph.qPageRank(spark, sf0001).count() === 25L)
    assert(Graph.qTriangleCount(spark, sf0001).count() === 1L)
  }
}
