package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gate shared between the driver-side test and the executor-side UDF
  * (same JVM in local mode; object fields resolve statically, so nothing
  * here needs to serialize). `armed` makes exactly one task block.
  */
object OccGate {
  val armed = new AtomicBoolean(false)
  @volatile var entered: CountDownLatch = _
  @volatile var release: CountDownLatch = _
}

/** Optimistic concurrency on staged rewrites: a writer whose stage was
  * built against a version another commit has since superseded must
  * FAIL (Delta's ConcurrentModificationException contract), not swap in
  * and silently undo the other commit.
  */
class OccSpec extends SparkSpec {
  import spark.implicits._

  test("a rewrite staged against a stale version fails instead of losing the concurrent commit") {
    val root = Files.createTempDirectory("graft_occ").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    OccGate.entered = new CountDownLatch(1)
    OccGate.release = new CountDownLatch(1)
    OccGate.armed.set(true)
    val gate = udf { (id: Long) =>
      if (OccGate.armed.getAndSet(false)) {
        OccGate.entered.countDown()
        OccGate.release.await(60, TimeUnit.SECONDS): Unit
      }
      id
    }
    // the DELETE's staging write evaluates the predicate — the gate UDF
    // parks it mid-stage, after the rewrite captured its base version
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val deleting = Future {
      lake.delete(gate(col("id")) === 999L)
    }
    assert(OccGate.entered.await(60, TimeUnit.SECONDS),
      "staging write never reached the gate")
    // a concurrent writer lands a commit while the delete is staged
    LakeTable(spark, s"$root/t")
      .write(Seq((3L, 30.0)).toDF("id", "x"), SaveMode.Append)
    OccGate.release.countDown()
    val e = intercept[java.util.ConcurrentModificationException] {
      Await.result(deleting, 120.seconds)
    }
    assert(e.getMessage.contains("concurrent commit"))
    // the LATER writer lost: the append survives, the table is whole,
    // and the failed stage left no debris
    assert(lake.read.count() === 3)
    assert(!new java.io.File(s"$root/t${LakeTable.StageSuffix}").exists)
    // the failed delete retries cleanly against the new state
    lake.delete(col("id") === 3L)
    assert(lake.read.orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 20.0)))
  }

  test("a commit landing during the change-feed job conflicts too") {
    // the OCC base is captured BEFORE the snapshot read, so a commit
    // landing while the change-feed materialization job runs (which
    // happens before the staging write even starts) must also fail the
    // delete — this window predates rewrite() entry
    val root = Files.createTempDirectory("graft_occ_feed").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    OccGate.entered = new CountDownLatch(1)
    OccGate.release = new CountDownLatch(1)
    OccGate.armed.set(true)
    val gate = udf { (id: Long) =>
      if (OccGate.armed.getAndSet(false)) {
        OccGate.entered.countDown()
        OccGate.release.await(60, TimeUnit.SECONDS): Unit
      }
      id
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // changeFeed = true: the FIRST job evaluating the gated predicate is
    // the change-set materialization, well before rewrite() runs
    val deleting = Future {
      lake.delete(gate(col("id")) === 1L, changeFeed = true)
    }
    assert(OccGate.entered.await(60, TimeUnit.SECONDS))
    LakeTable(spark, s"$root/t")
      .write(Seq((3L, 30.0)).toDF("id", "x"), SaveMode.Append)
    OccGate.release.countDown()
    intercept[java.util.ConcurrentModificationException] {
      Await.result(deleting, 120.seconds)
    }
    // nothing deleted, append intact, and the aborted change set is gone
    assert(lake.read.count() === 3)
    assert(!new java.io.File(s"$root/t/${LakeTable.ChangesDirName}").exists ||
      new java.io.File(s"$root/t/${LakeTable.ChangesDirName}").list().isEmpty)
  }

  test("sequential rewrites never trip the check") {
    val root = Files.createTempDirectory("graft_occ_seq").toString
    val lake = LakeTable(spark, s"$root/t")
      .write(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "x"))
    lake.update(Map("x" -> lit(9.0)), col("id") === 1L)
    lake.delete(col("id") === 2L)
    lake.compact()
    assert(lake.read.count() === 2)
  }
}
