package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.{FileClaimCoordinator, LakeIo, LakeTable, S3SimFs}

/** Cross-PROCESS Coordinated object-store probe (not part of the driver
  * contract; BASELINE.md records its numbers).
  *
  * ObjectStoreSpec proves the Coordinated mode's claim protocol
  * in-process; this probe runs it the way the mode exists to be run —
  * TWO REAL writer processes racing commits on ONE table over the
  * emulated-s3a substrate ([[graft.sources.S3SimFs]]: PUT-at-close
  * create, copy+delete rename), arbitrated by a shared FILE-BACKED
  * coordinator (atomic-create on a local coordination dir — the
  * DynamoDB-seam stand-in, exact across processes via link(2)).
  *
  * Audit (the ConcurrencyProbe per-batch contract): every (writer,
  * batch) present EXACTLY once row-wise AND tag-wise (zero lost
  * commits), commit versions distinct, the coordinator actually
  * arbitrated (claim files exist), and the table stays fully usable
  * (vacuum + follow-up append) afterwards.
  *
  * Usage: sbt "runMain graft.CoordProbe [writers [batches [rows]]]"
  */
object CoordProbe {

  private[graft] def s3fs(spark: SparkSession): FileSystem = {
    val fs = new S3SimFs()
    fs.initialize(URI.create("file:///"), spark.sessionState.newHadoopConf())
    fs
  }

  def main(args: Array[String]): Unit = {
    val nWriters = args.headOption.map(_.toInt).getOrElse(2)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val rows = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_coordprobe").toString
    val table = s"$root/t"
    val coordDir = s"$root/coord"
    println(s"root=$root writers=$nWriters batches=$nBatches rows=$rows")

    var failures = 0
    def check(name: String)(cond: Boolean, msg: => String): Unit =
      if (!cond) { failures += 1; println(s"FAIL [$name] $msg") }
      else println(s"ok   [$name]")

    LakeTable.fsDecoratorForTest = _ => s3fs(spark)
    LakeIo.objectStoreMode = LakeIo.Coordinated(new FileClaimCoordinator(coordDir))
    try {
      // parent seeds the table so children race pure APPENDS
      LakeTable(spark, table).write(
        Seq((-1L, -1, -1)).toDF("id", "writer", "batch").coalesce(1))

      val children = (0 until nWriters).map { w =>
        CrossProcessProbe.forkJvm("graft.CoordWriterMain",
          Seq(table, coordDir, w.toString, nBatches.toString, rows.toString),
          s"$root/w$w.log")
      }
      children.zipWithIndex.foreach { case (p, w) =>
        require(p.waitFor(900, java.util.concurrent.TimeUnit.SECONDS),
          s"writer $w timed out")
        if (p.exitValue() != 0) {
          failures += 1
          println(s"FAIL [child $w] exit=${p.exitValue()} — log tail:")
          scala.io.Source.fromFile(s"$root/w$w.log").getLines().toSeq
            .takeRight(15).foreach(l => println(s"  $l"))
        }
      }

      val lake = LakeTable(spark, table)
      val byBatch = lake.read.where(col("writer") >= 0)
        .groupBy("writer", "batch").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val expectedKeys =
        (for (w <- 0 until nWriters; b <- 0 until nBatches) yield (w, b)).toSet
      check("batches exactly once")(
        byBatch.keySet == expectedKeys && byBatch.values.forall(_ == rows),
        s"per-batch audit drifted: ${byBatch.size} batches, " +
          s"missing=${(expectedKeys -- byBatch.keySet).take(5)}, " +
          s"dup/short=${byBatch.filter(_._2 != rows).take(5)}")
      val ids = lake.read.select("id").as[Long].collect()
      check("ids exactly once")(ids.length == ids.distinct.length,
        s"${ids.length - ids.distinct.length} duplicate ids")
      // tag-wise: every batch's commit record exists (zero lost commits)
      val lost = (for (w <- 0 until nWriters; b <- 0 until nBatches) yield (w, b))
        .filterNot { case (w, b) => lake.hasCommitParam("xprocBatch", s"$w:$b") }
      check("zero lost commits")(lost.isEmpty, s"lost commit tags: ${lost.take(5)}")
      val versions = lake.history.select("version").as[Long].collect().toSeq
      check("versions distinct")(versions.distinct.length == versions.length,
        s"duplicate versions: ${versions.diff(versions.distinct).take(5)}")
      val claims = new java.io.File(coordDir).listFiles()
        .count(_.getName.startsWith("claim_"))
      check("coordinator arbitrated")(claims >= nWriters * nBatches,
        s"only $claims claim files for ${nWriters * nBatches} batches")

      lake.vacuumDebris(): Unit
      LakeTable(spark, table).write(
        Seq((-2L, -2, -2)).toDF("id", "writer", "batch").coalesce(1),
        SaveMode.Append): Unit
      check("usable after")(
        LakeTable(spark, table).read.count() ==
          2 + nWriters.toLong * nBatches * rows,
        "post-vacuum follow-up append drifted")

      println(s"""{"probe":"coord_xproc","writers":$nWriters,""" +
        s""""batches":$nBatches,"rows":$rows,"claims":$claims,""" +
        s""""failures":$failures}""")
    } finally {
      LakeTable.fsDecoratorForTest = identity(_)
      LakeIo.objectStoreMode = LakeIo.Refuse
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

/** Child writer process: appends tagged unique-id batches to the shared
  * table through the emulated object store and the shared file-backed
  * coordinator. Args: table coordDir writerId nBatches rows
  */
object CoordWriterMain {
  def main(args: Array[String]): Unit = {
    val Array(table, coordDir, widS, nbS, rowsS) = args
    val writerId = widS.toInt
    val nBatches = nbS.toInt
    val rows = rowsS.toInt
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    LakeTable.fsDecoratorForTest = _ => CoordProbe.s3fs(spark)
    LakeIo.objectStoreMode = LakeIo.Coordinated(new FileClaimCoordinator(coordDir))
    val lake = LakeTable(spark, table)
    (0 until nBatches).foreach { b =>
      val base = writerId * 10000000L + b.toLong * rows
      lake.write((0 until rows).map(i => (base + i, writerId, b))
        .toDF("id", "writer", "batch").coalesce(1), SaveMode.Append,
        extraParams = Map("xprocBatch" -> s"$writerId:$b")): Unit
    }
    println(s"""{"writer":$writerId,"batches":$nBatches}""")
    spark.stop()
  }
}
