package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Triangle-count density probe (not part of the driver contract): the
  * bench's most expensive query is q_triangle_count, whose cost at scale
  * IS the size of the degree-oriented wedge intermediate. This probe
  * records that size against edge count on the exact derived graph the
  * bench runs (lineitem keys mod 20000) at 1× and a 10× replication —
  * node-shifted disjoint copies, so the analytically expected curve is
  * LINEAR (10× edges → 10× wedges) — plus a deliberately DENSER variant
  * (same replication crammed into the original node space) showing how
  * the wedge count responds when density, not data volume, grows. The
  * recorded max out-degree documents the √m orientation cap doing its
  * job. Results in BASELINE.md.
  *
  * Usage: runMain graft.GraphProbe [sfDir]
  */
object GraphProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val nodes = 20000
    val base = graft.core.Tables(spark, sfDir).lineitem.select(
      (col("l_orderkey") % nodes).as("src"),
      (col("l_partkey") % nodes).as("dst"))

    def run(label: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val oriented = graft.analytics.Graph.orientEdges(edges)
      val m = oriented.count()
      val maxOutDeg = oriented.groupBy(col("lo"))
        .agg(count(lit(1)).as("d")).agg(max(col("d"))).head().getLong(0)
      val wedges = graft.analytics.Graph.orientedWedges(oriented).count()
      val triangles = graft.analytics.Graph.triangleCount(edges)
        .head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"probe":"$label","edges":$m,"maxOutDeg":$maxOutDeg,""" +
          s""""wedges":$wedges,"wedgesPerEdge":${"%.2f".format(
            wedges.toDouble / m)},"triangles":$triangles,""" +
          s""""sec":${"%.2f".format(sec)}}""")
    }

    // disjoint replication: data volume grows, density does not
    def replicated(k: Int) = (0 until k)
      .map(r => base.select(
        (col("src") + lit(r.toLong * nodes)).as("src"),
        (col("dst") + lit(r.toLong * nodes)).as("dst")))
      .reduce(_ union _)

    run("triangles_1x", base)
    run("triangles_10x_disjoint", replicated(10))
    // dense variant: 10x the rows into the SAME node space — distinct
    // collapses duplicates, so edges grow sub-10x while density rises
    run("triangles_10x_dense", base.union(
      (1 until 10).map(r => base.select(
        ((col("src") + r) % nodes).as("src"),
        ((col("dst") + 3 * r) % nodes).as("dst"))).reduce(_ union _)))
    spark.stop()
  }
}
