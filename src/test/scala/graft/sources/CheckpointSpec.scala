package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Commit-log checkpointing: every Nth commit folds the log into one
  * checkpoint file and removes the per-commit files it covers, keeping
  * log reads O(1 + commits-since-checkpoint) forever — while history,
  * idempotence tags, DV claims, and COPY INTO ledgers stay exact.
  */
class CheckpointSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_cptest").resolve("t").toString

  private def hadoopFs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  test("checkpoint folds records and deletes covered commit files") {
    val dir = new Path(tmp(), LakeTable.LogDirName)
    val fs = hadoopFs(dir.toString)
    (0 until 25).foreach { i =>
      CommitLog.append(fs, dir, "WRITE", Map("i" -> i.toString), checkpointEvery = 10)
    }
    val names = fs.listStatus(dir).map(_.getPath.getName).sorted
    // checkpoints happened at v10 and v20; only the latest survives
    assert(names.count(_.endsWith(".checkpoint")) === 1)
    assert(names.exists(_ == f"${20L}%020d.checkpoint"))
    val jsons = names.filter(_.endsWith(".json"))
    assert(jsons.length === 4, s"only v21..v24 should remain: ${jsons.toSeq}")
    // the full record set is intact and ordered
    val recs = CommitLog.records(fs, dir)
    assert(recs.size === 25)
    assert(CommitLog.currentCount(fs, dir) === 25L)
    val versions = recs.map(r => r.split(",")(0).split(":")(1).toLong)
    assert(versions === (0L until 25L).toSeq)
    // the next version continues past the checkpoint even with no tail
    assert(CommitLog.nextVersion(fs, dir) === 25L)
  }

  test("nextVersion survives a checkpoint with zero tail commits") {
    val dir = new Path(tmp(), LakeTable.LogDirName)
    val fs = hadoopFs(dir.toString)
    (0 to 10).foreach { i =>
      CommitLog.append(fs, dir, "WRITE", Map("i" -> i.toString), checkpointEvery = 10)
    }
    // v10 checkpointed; delete nothing more — next must be 11
    assert(CommitLog.nextVersion(fs, dir) === 11L)
    assert(CommitLog.append(fs, dir, "WRITE", Map.empty, checkpointEvery = 10) === 11L)
  }

  test("lake table state survives checkpointing: history, DV claims, copy ledgers, stats spec") {
    val o = Tables(spark, sf0001).orders
    spark.conf.set(LakeTable.CheckpointIntervalKey, "5")
    try {
      val src = Files.createTempDirectory("graft_cpsrc").resolve("s").toString
      o.write.parquet(src)
      val lake = LakeTable(spark, tmp())
      lake.copyInto(src)                                    // v0
      lake.collectStats(Seq("o_totalprice"),
        bloomFor = Seq("o_orderkey"))                       // v1
      lake.deleteVectored(col("o_totalprice") > 200000)     // v2
      lake.addConstraint("price_pos", "o_totalprice >= 0")  // v3
      lake.dropConstraint("price_pos")                      // v4
      lake.update(Map("o_orderpriority" -> lit("X")),
        col("o_orderkey") < 0)                              // v5 -> checkpoint
      val appended = o.orderBy("o_orderkey").limit(10).localCheckpoint(true)
      lake.write(appended, org.apache.spark.sql.SaveMode.Append) // v6
      val fs = hadoopFs(lake.path)
      val logDir = new Path(lake.path, LakeTable.LogDirName)
      assert(fs.listStatus(logDir).exists(_.getPath.getName.endsWith(".checkpoint")),
        "a checkpoint should exist at interval 5")
      // every consumer still sees pre-checkpoint state
      assert(lake.history.count() >= 7)
      assert(lake.hasDeletionVectors, "DV claim (v2) must survive the checkpoint")
      assert(lake.read.where(col("o_totalprice") > 200000).count() ===
        appended.where(col("o_totalprice") > 200000).count(),
        "only the post-DV appended rows may exceed the deleted range")
      lake.copyInto(src) // ledger claim (v0) must survive -> no-op
      assert(lake.history.where(
        col("operationParameters.copyLedger").isNotNull).count() === 1)
      lake.refreshStats() // stats spec (v1) must survive
      val stats = spark.read.parquet(lake.path + "/" + LakeTable.StatsDirName)
      assert(stats.columns.contains(FileStats.bloomCol("o_orderkey")))
    } finally spark.conf.unset(LakeTable.CheckpointIntervalKey)
  }

  test("streaming sink idempotence tags survive checkpoint compaction") {
    val dir = new Path(tmp(), LakeTable.LogDirName)
    val fs = hadoopFs(dir.toString)
    CommitLog.append(fs, dir, "WRITE APPEND",
      Map("streamTxn:app1" -> "7"), checkpointEvery = 3)
    (0 until 5).foreach { i =>
      CommitLog.append(fs, dir, "WRITE", Map("i" -> i.toString), checkpointEvery = 3)
    }
    val lake = new LakeTable(spark, new Path(dir.toString).getParent.toString)
    assert(lake.maxCommitParamLong("streamTxn:app1") === 7L)
    assert(lake.hasCommitParam("streamTxn:app1", "7"))
  }
}
