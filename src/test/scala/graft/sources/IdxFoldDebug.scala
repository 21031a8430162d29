package graft.sources

import java.nio.file.Files

import graft.core.GraftSession
import graft.text.InvertedIndex

/** Ad-hoc reproducer for the BM25 fold crash walk — prints per-subtable
  * history and commit params around one fuse position.
  * Usage: Test/runMain graft.sources.IdxFoldDebug <fuse>
  */
object IdxFoldDebug {
  def main(args: Array[String]): Unit = {
    val fuse = args.headOption.map(_.toInt).getOrElse(30)
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_idxdbg").toString
    val docs = LakeTable(spark, s"$root/docs")
    docs.write((0L until 12L).map(i =>
      (i, s"seed doc $i tok${i % 5} tok${(i + 2) % 7}"))
      .toDF("doc_id", "text").coalesce(1)): Unit
    InvertedIndex.build(docs, "doc_id", "text", s"$root/idx")
    docs.upsert(
      (Seq((12L, "fresh tok1 tok9"), (13L, "fresh tok2 tok9"),
        (14L, "fresh tok3"), (15L, "fresh tok4 tok9")) ++
        Seq((3L, "updated tok5"), (7L, "updated tok5 tok1")))
        .toDF("doc_id", "text").coalesce(1),
      Seq("doc_id"), changeFeed = true): Unit

    def dump(label: String): Unit = {
      println(s"==== $label ====")
      Seq("postings", "terms", "stats").foreach { s =>
        val t = LakeTable(spark, s"$root/idx/$s")
        if (t.exists) {
          println(s"-- $s history:")
          try t.history.select("version", "operation", "operationParameters")
            .collect().foreach(r => println("   " + r))
          catch { case e: Throwable => println(s"   history unreadable: ${e.getMessage}") }
        } else println(s"-- $s: does not exist")
      }
      val terms = LakeTable(spark, s"$root/idx/terms")
      if (terms.exists)
        try println("terms rows: " + terms.read.collect().map(_.toString).sorted.mkString(","))
        catch { case e: Throwable => println("terms unreadable: " + e.getMessage) }
      println("terms maxCommitParam graftIndexFold = " +
        (try terms.maxCommitParamLong("graftIndexFold").toString
         catch { case e: Throwable => "err " + e.getMessage }))
    }

    val conf = spark.sessionState.newHadoopConf()
    LakeTable.fsDecoratorForTest = _ => {
      val raw = new GatedRawFs()
      raw.initialize(java.net.URI.create("file:///"), conf)
      val f = new org.apache.hadoop.fs.LocalFileSystem(raw)
      f.initialize(java.net.URI.create("file:///"), conf)
      f
    }
    FsFuse.arm(fuse)
    val outcome = try {
      InvertedIndex.applyChanges(docs, "doc_id", "text", s"$root/idx"); None
    } catch { case t: Throwable => Some(t) }
    FsFuse.disarm()
    LakeTable.fsDecoratorForTest = identity(_)
    println(s"fuse=$fuse fired=${FsFuse.fired} outcome=${outcome.map(_.toString).getOrElse("completed")}")
    dump("after crash")
    Seq("postings", "terms", "stats").foreach { s =>
      val t = LakeTable(spark, s"$root/idx/$s")
      if (t.exists) t.vacuumDebris(): Unit
    }
    dump("after vacuum")
    InvertedIndex.applyChanges(docs, "doc_id", "text", s"$root/idx")
    dump("after refold")
    spark.stop()
  }
}
