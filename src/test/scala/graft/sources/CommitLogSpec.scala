package graft.sources

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class CommitLogSpec extends SparkSpec {

  test("concurrent commits: every record lands, versions dense and distinct") {
    val logDir = new Path(
      Files.createTempDirectory("graft_commitlog").toString, LakeTable.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = 32
    val pool = Executors.newFixedThreadPool(8)
    try {
      val start = new CountDownLatch(1)
      val futures = (0 until n).map { i =>
        pool.submit(new Callable[Long] {
          override def call(): Long = {
            start.await()
            CommitLog.append(fs, logDir, "WRITE", Map("writer" -> i.toString))
          }
        })
      }
      start.countDown()
      val versions = futures.map(_.get(60, TimeUnit.SECONDS))
      // the old overwrite=true append lost records here: two writers
      // agreed on a version and the later close() clobbered the earlier
      assert(versions.toSet === (0L until n).toSet,
        s"expected dense versions 0..${n - 1}, got ${versions.sorted}")
      assert(CommitLog.currentCount(fs, logDir) === n.toLong)
    } finally pool.shutdown()
  }

  test("nextVersion moves past gaps instead of reusing a cleaned-up version") {
    val logDir = new Path(
      Files.createTempDirectory("graft_commitlog_gap").toString, LakeTable.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach(i => CommitLog.append(fs, logDir, "WRITE", Map("i" -> i.toString)))
    // simulate manual cleanup of an old commit record
    fs.delete(new Path(logDir, f"${1L}%020d.json"), false)
    assert(CommitLog.nextVersion(fs, logDir) === 3L)
    assert(CommitLog.append(fs, logDir, "WRITE", Map.empty) === 3L)
  }

  test("two table handles on one path interleave commits without loss") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft_twowriters").resolve("t").toString
    val a = LakeTable(spark, path).write(Seq((1L, 1.0)).toDF("id", "x"))
    val b = LakeTable(spark, path)
    b.addConstraint("x_pos", "x > 0")
    a.upsert(Seq((2L, 2.0)).toDF("id", "x"), Seq("id"))
    val hist = a.history.select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist.keySet === Set(0L, 1L, 2L), hist.toString)
    assert(hist.values.toSet === Set("WRITE OVERWRITE", "ADD CONSTRAINT", "MERGE"))
  }
}
