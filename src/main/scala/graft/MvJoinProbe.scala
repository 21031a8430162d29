package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.sources.{LakeTable, MaterializedJoin}

/** Incremental-join-view scale probe (not part of the driver contract):
  * lineitem (optionally replicated) joined to part as a materialized
  * view, then a SMALL change-feed mutation on each leg timed as (a) an
  * incremental [[MaterializedJoin.refresh]] and (b) the from-scratch
  * recompute + rewrite the refresh replaces. The claim under test is
  * refresh = O(changes) + O(view-touch): its cost should track the
  * delta size, not the table size, so the refresh:recompute gap must
  * WIDEN as the fact table grows. Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.MvJoinProbe [rep]
  */
object MvJoinProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_mvjprobe")

    val li0 = Tables(spark, sfDir).lineitem
      .withColumn("uid", col("l_orderkey") * 10 + col("l_linenumber"))
      .select("uid", "l_partkey", "l_quantity", "l_extendedprice")
    val li =
      if (rep <= 1) li0.localCheckpoint(true)
      else li0.crossJoin(spark.range(rep).select(col("id").as("__r")))
        .withColumn("uid", col("uid") * rep + col("__r")).drop("__r")
        .localCheckpoint(true)
    val pt = Tables(spark, sfDir).part
      .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_retailprice"))

    // fact and view both clustered + stats'd on the merge key, so the
    // refresh's keyed merges take the SELECTIVE rewrite path (only files
    // holding touched uids rewrite) — the layout a CDC-fed 100 TB table
    // runs with anyway (MergeProbe measures the same discipline)
    val fact = LakeTable(spark, s"$base/fact").write(li)
      .optimize(Seq("uid"), numFiles = Some(32))
    fact.collectStats(Seq("uid"), bloomFor = Seq("uid"))
    val dim = LakeTable(spark, s"$base/dim").write(pt)
    val n = fact.read.count()
    // BOTH layouts of the same view, maintained side by side: pk-clustered
    // (fact churn stays file-local, dim cascades scatter) vs
    // joinKey-clustered (dim cascades stay file-local via the merges'
    // joinKey prune, scattered fact pks pay more) — the clustering choice
    // initialize() exposes, measured instead of asserted
    val mv = MaterializedJoin(spark, fact, dim, s"$base/view", "uid", "l_partkey")
    val mvJk = MaterializedJoin(spark, fact, dim, s"$base/view_jk", "uid", "l_partkey")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val tInit = timed(mv.initialize(clusterBy = Some("uid"), numFiles = Some(32)))
    mvJk.initialize(clusterBy = Some("l_partkey"), numFiles = Some(32))

    // fact delta: a CONTIGUOUS 0.1% uid band (the CDC shape — recent
    // keys cluster; a scattered-key delta would touch every file and
    // rightly cost O(table) in ANY engine)
    val lo = n / 2
    fact.update(Map("l_quantity" -> (col("l_quantity") + 1)),
      col("uid") >= lo && col("uid") < lo + n / 1000, changeFeed = true)
    val tFact = timed(mv.refresh())
    val tFactJk = timed(mvJk.refresh())
    // maintenance cadence between deltas, as a real deployment runs it:
    // the scattered-pk merge FULL-rewrote the jk view (the honest cost of
    // that layout under fact churn, billed to jk_refresh_fact_s above)
    // and left unstatted, unclustered files — re-optimize and re-stat so
    // the next delta meets each view in its declared layout
    locally {
      val v = LakeTable(spark, s"$base/view")
      v.collectStats(Seq("uid", "l_partkey"))
      val vjk = LakeTable(spark, s"$base/view_jk")
      vjk.optimize(Seq("l_partkey"), numFiles = Some(32))
      vjk.collectStats(Seq("uid", "l_partkey"))
    }
    // dim delta: a 3-key price change whose cascade scatters across the
    // pk-clustered view — the honest worst case for that clustering, and
    // exactly what the joinKey layout localizes
    dim.update(Map("p_retailprice" -> (col("p_retailprice") * 1.1)),
      col("l_partkey").isin(3L, 70L, 141L), changeFeed = true)
    val tDim = timed(mv.refresh())
    val tDimJk = timed(mvJk.refresh())

    // files the dim-delta merge rewrote vs pulled through, per layout
    def lastMergeFiles(path: String): (Int, Int) = {
      val r = LakeTable(spark, path).history
        .where(col("operation") === "MERGE")
        .orderBy(col("version").desc)
        .select("operationParameters.filesRewritten", "operationParameters.filesKept")
        .collect().headOption
      r.map(x => (Option(x.getString(0)).fold(-1)(_.toInt),
        Option(x.getString(1)).fold(-1)(_.toInt))).getOrElse((-1, -1))
    }
    val (pkRw, pkKeep) = lastMergeFiles(s"$base/view")
    val (jkRw, jkKeep) = lastMergeFiles(s"$base/view_jk")

    // what each refresh replaced: recompute the join and rewrite the view
    val tRecompute = timed {
      LakeTable(spark, s"$base/view_full").write(mv.recompute())
    }

    println(
      s"""{"probe":"mvjoin","rep":$rep,"fact_rows":$n,""" +
        f""""init_s":$tInit%.2f,"refresh_fact_s":$tFact%.2f,""" +
        f""""refresh_dim_s":$tDim%.2f,"recompute_s":$tRecompute%.2f,""" +
        f""""fact_speedup":${tRecompute / tFact}%.2f,""" +
        f""""jk_refresh_fact_s":$tFactJk%.2f,"jk_refresh_dim_s":$tDimJk%.2f,""" +
        s""""dim_files_rewritten_pk":$pkRw,"dim_files_kept_pk":$pkKeep,""" +
        s""""dim_files_rewritten_jk":$jkRw,"dim_files_kept_jk":$jkKeep}""")
    spark.stop()
  }
}
