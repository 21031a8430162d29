package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.ConnectedComponents

/** Connected-components scale probe (not part of the driver contract):
  * a synthetic graph of `blocks` chains of `blockSize` nodes each —
  * chains are the WORST case for min-label propagation (label travels
  * one hop per round, so rounds = chain length), unlike the shallow
  * near-dup cliques the operator serves in practice. Generated
  * distributedly from `spark.range` (no driver-side edge list).
  *
  * Measures wall time and round count at node counts far beyond the
  * testdata, demonstrating the convergence behavior and the
  * localCheckpoint lineage cut hold at scale. Results in BASELINE.md.
  *
  * Usage: runMain graft.CcProbe [nodes] [blockSize]
  */
object CcProbe {

  def main(args: Array[String]): Unit = {
    val nodes = args.headOption.map(_.toLong).getOrElse(1000000L)
    val blockSize = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    // chain edges i -> i+1 inside each block of blockSize consecutive ids
    val edges = spark.range(nodes - 1)
      .where((col("id") % blockSize) =!= (blockSize - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))

    val t0 = System.nanoTime()
    val comp = ConnectedComponents.components(edges, maxIter = blockSize + 2)
    val nComponents = comp.select(col("component")).distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9

    val expected = (nodes + blockSize - 1) / blockSize
    println(
      f"""{"metric":"cc_scale_probe","nodes":$nodes,"block":$blockSize,""" +
        f""""components":$nComponents,"expected":$expected,"sec":$sec%.2f}""")
    assert(nComponents == expected,
      s"component count $nComponents != expected $expected")

    // deep-chain variant: diameter far beyond any sane propagation round
    // budget — only the large/small-star contraction (log rounds) can
    // finish. 100k nodes in chains of 1000: propagation would need 1000
    // rounds; star needs ~log2.
    val deepNodes = 100000L
    val deepBlock = 1000
    val deepEdges = spark.range(deepNodes - 1)
      .where((col("id") % deepBlock) =!= (deepBlock - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val t1 = System.nanoTime()
    val deepComp = ConnectedComponents.componentsStar(deepEdges, maxIter = 20)
      .select(col("component")).distinct().count()
    val deepSec = (System.nanoTime() - t1) / 1e9
    println(
      f"""{"metric":"cc_star_probe","nodes":$deepNodes,"block":$deepBlock,""" +
        f""""components":$deepComp,"expected":${deepNodes / deepBlock},"sec":$deepSec%.2f}""")
    assert(deepComp == deepNodes / deepBlock)
    spark.stop()
  }
}
