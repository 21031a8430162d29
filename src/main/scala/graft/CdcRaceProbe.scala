package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.GraftSession
import graft.sources.{LakeTable, MaterializedAgg, MaterializedJoin, Scd}
import graft.text.{InvertedIndex, IvfIndex}

/** CDC consumer race probe (not part of the driver contract): every
  * change-feed consumer family the library ships — BM25 and IVF
  * index-maintenance streams, MaterializedJoin and MaterializedAgg
  * view streams, and the downstream-replica `applyChangesStream` —
  * polling on a hot `ProcessingTime(0)` trigger while a writer loop
  * hammers the base tables with upserts, updates, deletes and
  * staged-swap compactions. This measures the change-set publication
  * contract (immutable once visible, post-commit rename, child-wise
  * swap) at the blast radius the round-12 race had: with the old
  * predicted-version layout ANY of these five streams could die with
  * FAILED_READ_FILE.FILE_NOT_EXIST when a poll interleaved a rename,
  * abort-delete, or swap move. The claims, measured not asserted:
  *   - zero stream deaths across every writer/poller interleaving;
  *   - zero divergence at the end: each index equals a rebuild, each
  *     view equals its recompute, the replica equals its source —
  *     every change set consumed exactly once despite the swaps.
  * Results recorded in BASELINE.md.
  *
  * Usage: runMain graft.CdcRaceProbe [iterations]
  */
object CdcRaceProbe {

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(48)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrace").toString

    // one corpus base feeding BOTH index streams (text for BM25, a 2-d
    // unit-ish vector for IVF), one fact + dim pair feeding the join
    // view, the agg view and the replica
    def vec(i: Int): Array[Float] = {
      val a = (i % 7 + 1).toFloat / 7f
      Array(a, 1f - a)
    }
    val docs = LakeTable(spark, s"$root/docs").write(
      Seq.tabulate(48)(i => (i.toLong, s"apple banana word$i cherry", vec(i)))
        .toDF("doc_id", "text", "vec"))
    val fact = LakeTable(spark, s"$root/fact").write(
      Seq.tabulate(60)(i => (i.toLong, s"k${i % 8}", i * 1.0))
        .toDF("id", "k", "v"))
    val dim = LakeTable(spark, s"$root/dim").write(
      Seq.tabulate(8)(i => (s"k$i", s"name$i")).toDF("k", "name"))

    val bmDir = s"$root/bm25"
    val ivfDir = s"$root/ivf"
    InvertedIndex.build(docs, "doc_id", "text", bmDir)
    IvfIndex.build(docs, "doc_id", "vec", ivfDir, nCells = 8, seed = 7L,
      sampleFraction = 1.0)
    val mj = new MaterializedJoin(spark, fact, dim, s"$root/mvj", "id", "k")
      .initialize()
    val ma = new MaterializedAgg(spark, fact, s"$root/mva", Seq("k"),
      Map("sum_v" -> col("v"))).initialize()
    val replica = LakeTable(spark, s"$root/replica").write(fact.read)

    // seed every leg's feed (the change-feed streaming source needs a
    // recorded change set for its schema)
    docs.delete(col("doc_id") === 47L, changeFeed = true)
    fact.update(Map("v" -> (col("v") + lit(0.5))), col("id") === 0L,
      changeFeed = true)
    dim.update(Map("name" -> lit("name0b")), col("k") === "k0",
      changeFeed = true)

    val hot = Trigger.ProcessingTime(0L)
    val streams = Seq(
      "bm25_maintenance" ->
        InvertedIndex.startMaintenanceStream(docs, "doc_id", "text", bmDir, hot),
      "ivf_maintenance" ->
        IvfIndex.startMaintenanceStream(docs, "doc_id", "vec", ivfDir, hot),
      "mv_join" -> mj.startStream(hot),
      "mv_agg" -> ma.startStream(hot),
      "replica" -> Scd.applyChangesStream(fact, replica, Seq("id"), hot))

    val t0 = System.nanoTime()
    var mutations = 0
    var swaps = 0
    try {
      for (i <- 0 until iters) {
        i % 6 match {
          case 0 =>
            docs.upsert(Seq((1000L + i, s"grape durian new$i", vec(i)))
              .toDF("doc_id", "text", "vec"), Seq("doc_id"), changeFeed = true)
            fact.upsert(Seq((1000L + i, s"k${i % 8}", i * 2.0))
              .toDF("id", "k", "v"), Seq("id"), changeFeed = true)
            mutations += 2; swaps += 2
          case 1 =>
            docs.update(Map("text" -> concat(col("text"), lit(s" upd$i"))),
              col("doc_id") === (i % 40).toLong, changeFeed = true)
            dim.update(Map("name" -> concat(col("name"), lit(s"-$i"))),
              col("k") === s"k${i % 8}", changeFeed = true)
            mutations += 2; swaps += 2
          case 2 =>
            docs.delete(col("doc_id") === (i % 46).toLong, changeFeed = true)
            fact.delete(col("id") === (i % 55).toLong, changeFeed = true)
            mutations += 2; swaps += 2
          case 3 =>
            // exactly-representable increment: sums stay exact multiples
            // of 0.25 at these magnitudes, so the incremental view and
            // the recompute agree bit-for-bit regardless of the order
            // their partial sums accumulate in — the audit below is an
            // EXACT compare, and only a real maintenance bug (e.g. a
            // double-applied delta) can fail it
            fact.update(Map("v" -> (col("v") + lit(0.25))),
              col("id") > lit(50L), changeFeed = true)
            mutations += 1; swaps += 1
          case 4 =>
            // content-preserving staged swaps: the dir moves that killed
            // the old layout, racing all five pollers at once — plus the
            // feed's own retention trim (keep is far above the hot
            // streams' ~1-2 set lag, the documented retention contract)
            docs.compact(); fact.compact()
            docs.vacuumChanges(retainLast = 16)
            fact.vacuumChanges(retainLast = 16)
            swaps += 2
          case 5 =>
            dim.compact()
            docs.upsert(Seq((2000L + i, s"fig elderberry extra$i", vec(i + 3)))
              .toDF("doc_id", "text", "vec"), Seq("doc_id"), changeFeed = true)
            mutations += 1; swaps += 2
        }
        streams.foreach { case (name, q) =>
          require(q.exception.isEmpty,
            s"$name DIED during iteration $i: ${q.exception.get}")
        }
      }
      // finale feed commits so the last content-preserving swaps are
      // followed by a notification each stream folds to head
      docs.upsert(Seq((9999L, "grape finale", vec(5))).toDF("doc_id", "text", "vec"),
        Seq("doc_id"), changeFeed = true)
      fact.upsert(Seq((9999L, "k1", 9.9)).toDF("id", "k", "v"),
        Seq("id"), changeFeed = true)
      dim.update(Map("name" -> lit("name1-final")), col("k") === "k1",
        changeFeed = true)
      mutations += 3
      streams.foreach(_._2.processAllAvailable())
      streams.foreach { case (name, q) =>
        require(q.exception.isEmpty, s"$name DIED at drain: ${q.exception.get}")
      }
    } finally streams.foreach(_._2.stop())
    val wall = (System.nanoTime() - t0) / 1e9

    // the divergence audit: exactly-once consumption means each standing
    // artifact equals its from-scratch twin
    InvertedIndex.build(docs, "doc_id", "text", s"$root/bm25_rebuilt")
    IvfIndex.build(docs, "doc_id", "vec", s"$root/ivf_rebuilt", nCells = 8,
      seed = 7L, sampleFraction = 1.0)
    def bmServe(d: String) = InvertedIndex.serveBm25(spark, d,
      Seq(1L -> "grape", 2L -> "banana", 3L -> "apple", 4L -> "durian")
        .toDF("query_id", "term"), k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exhaustive probe (nProbe = nCells): a rebuild REFITS the
    // quantizer on the changed corpus, so pruned probe sets legitimately
    // differ — probing every cell makes both serves exact cosine top-k,
    // which must agree iff the maintained postings hold the same vectors
    def ivfServe(d: String) = IvfIndex.serveTopK(spark, d,
      Seq((1L, Array(0.9f, 0.1f)), (2L, Array(0.2f, 0.8f))).toDF("id", "vec"),
      "id", "vec", k = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(bmServe(bmDir) == bmServe(s"$root/bm25_rebuilt"),
      "BM25 index diverged from rebuild")
    require(ivfServe(ivfDir) == ivfServe(s"$root/ivf_rebuilt"),
      "IVF index diverged from rebuild")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSet
    def audit(name: String, got: Set[Seq[String]], want: Set[Seq[String]]): Unit =
      require(got == want,
        s"$name diverged from recompute:\n  extra: ${(got -- want).take(5)}" +
          s"\n  missing: ${(want -- got).take(5)}")
    audit("join view", rows(mj.read), rows(mj.recompute()))
    audit("agg view", rows(ma.read), rows(ma.aggregate(fact.read)))
    audit("replica", rows(replica.read), rows(fact.read))

    println(
      s"""{"probe":"cdc_race","iterations":$iters,"streams":${streams.length},""" +
        s""""feed_mutations":$mutations,"staged_swaps":$swaps,""" +
        s""""stream_deaths":0,"divergences":0,""" +
        f""""wall_s":$wall%.1f}""")
    spark.stop()
  }
}
