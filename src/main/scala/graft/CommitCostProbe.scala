package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.LakeTable

/** Commit-path cost attribution probe (not part of the driver
  * contract): times the three mechanically distinct lake write shapes
  * in isolation so a bench-level drift on commit-heavy queries can be
  * attributed to the commit record, the staged-rewrite swap, or the
  * metadata publications — run at two git revisions, diff per phase.
  *
  * Usage: runMain graft.CommitCostProbe [n]
  */
object CommitCostProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_commitcost").toString
    val lake = LakeTable(spark, s"$root/t").write(
      Seq.tabulate(1000)(i => (i.toLong, s"k${i % 8}", i * 1.0)).toDF("id", "k", "v"))

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"""{"phase":"$label","n":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    // warm-up: one of each shape
    lake.write(Seq((9999L, "k0", 1.0)).toDF("id", "k", "v"),
      org.apache.spark.sql.SaveMode.Append)
    lake.update(Map("v" -> (col("v") + lit(0.25))), col("id") === 0L)
    lake.compact()

    time("append") {
      (0 until n).foreach { i =>
        lake.write(Seq((10000L + i, "k1", i * 1.0)).toDF("id", "k", "v"),
          org.apache.spark.sql.SaveMode.Append)
      }
    }
    time("update_swap") {
      (0 until n).foreach { i =>
        lake.update(Map("v" -> (col("v") + lit(0.25))), col("id") === (i % 50).toLong)
      }
    }
    time("update_swap_feed") {
      (0 until n).foreach { i =>
        lake.update(Map("v" -> (col("v") + lit(0.25))), col("id") === (i % 50).toLong,
          changeFeed = true)
      }
    }
    time("compact") {
      (0 until math.max(n / 4, 3)).foreach(_ => lake.compact())
    }
    time("properties") {
      (0 until n).foreach(i => lake.setTableProperties(Seq("probe.k" -> s"v$i")))
    }
    spark.stop()
  }
}
