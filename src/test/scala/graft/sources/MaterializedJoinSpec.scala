package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_mvj").resolve("t").toString

  private def snap(mv: MaterializedJoin): Set[(Long, Long, Double, String)] =
    mv.read.select("id", "k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet

  private def direct(mv: MaterializedJoin): Set[(Long, Long, Double, String)] =
    mv.recompute().select("id", "k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet

  test("refresh == recompute across fact deltas, dim deltas, and both at once") {
    val fact = LakeTable(spark, tmp()).write(Seq(
      (1L, 10L, 100.0), (2L, 20L, 200.0), (3L, 30L, 300.0),
      (4L, 99L, 400.0) // unmatched fk: not in the view until k=99 exists
    ).toDF("id", "k", "v"))
    val dim = LakeTable(spark, tmp())
      .write(Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "name"))
    val mv = MaterializedJoin(spark, fact, dim, tmp(), "id", "k")
    mv.initialize()
    assert(snap(mv) === direct(mv) && snap(mv).size === 3)

    // fact-only delta: insert, update, delete — postimages only, no scan
    fact.upsert(Seq((5L, 10L, 500.0)).toDF("id", "k", "v"), Seq("id"), changeFeed = true)
    fact.update(Map("v" -> (col("v") * 2)), col("id") === 2L, changeFeed = true)
    fact.delete(col("id") === 3L, changeFeed = true)
    mv.refresh()
    assert(snap(mv) === direct(mv))
    assert(snap(mv).map(_._1) === Set(1L, 2L, 5L))
    assert(snap(mv).exists(t => t._1 == 2L && t._3 == 400.0))

    // dim-only delta: a delete cascades, an update rewrites every
    // holder, an insert materializes the previously-unmatched fk
    dim.delete(col("k") === 10L, changeFeed = true)
    dim.update(Map("name" -> lit("B")), col("k") === 20L, changeFeed = true)
    dim.upsert(Seq((99L, "z")).toDF("k", "name"), Seq("k"), changeFeed = true)
    mv.refresh()
    assert(snap(mv) === direct(mv))
    assert(snap(mv) === Set((2L, 20L, 400.0, "B"), (4L, 99L, 400.0, "z")))

    // re-refresh with nothing new is a no-op (exactly-once)
    mv.refresh()
    assert(snap(mv) === Set((2L, 20L, 400.0, "B"), (4L, 99L, 400.0, "z")))

    // both legs move before ONE refresh, including a fact row whose fk
    // MOVES onto a dim key that is deleted in the same window
    fact.update(Map("k" -> lit(30L)), col("id") === 4L, changeFeed = true)
    dim.delete(col("k") === 20L, changeFeed = true)
    dim.upsert(Seq((30L, "c2")).toDF("k", "name"), Seq("k"), changeFeed = true)
    mv.refresh()
    assert(snap(mv) === direct(mv))
    assert(snap(mv) === Set((4L, 30L, 400.0, "c2")))
  }

  test("startStream keeps the join view current as EITHER leg commits") {
    val fact = LakeTable(spark, tmp())
      .write(Seq((1L, 10L, 1.0), (2L, 20L, 2.0)).toDF("id", "k", "v"))
    val dim = LakeTable(spark, tmp())
      .write(Seq((10L, "a"), (20L, "b")).toDF("k", "name"))
    val mv = MaterializedJoin(spark, fact, dim, tmp(), "id", "k")
    mv.initialize()
    // seed BOTH feeds so each streaming source has a schema to read
    fact.update(Map("v" -> lit(1.5)), col("id") === 1L, changeFeed = true)
    dim.update(Map("name" -> lit("a2")), col("k") === 10L, changeFeed = true)
    val q = mv.startStream(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    // Drain, honoring the documented freshness contract: a change set
    // whose COMMIT was still in flight when its file triggered a batch
    // defers to the next feed commit — so if the view is stale after a
    // drain, nudge exactly one identity-update feed commit and drain
    // again (production's "next commit heals" path, made deterministic).
    def drainCurrent(label: String): Unit = {
      q.processAllAvailable()
      var nudges = 0
      while (snap(mv) != direct(mv) && nudges < 2) {
        fact.update(Map("v" -> col("v")), lit(true), changeFeed = true)
        q.processAllAvailable()
        nudges += 1
      }
      assert(snap(mv) === direct(mv), s"view stale after $label")
    }
    try {
      drainCurrent("the seed commits")
      fact.upsert(Seq((3L, 20L, 3.0)).toDF("id", "k", "v"), Seq("id"),
        changeFeed = true)
      drainCurrent("a fact commit")
      dim.delete(col("k") === 10L, changeFeed = true)
      drainCurrent("a dim cascade delete")
      assert(snap(mv).map(_._1) === Set(2L, 3L))
    } finally q.stop()
  }

  test("CDC-emitting view composes: join MV + agg MV maintain a pipeline end-to-end") {
    val fact = LakeTable(spark, tmp()).write(Seq(
      (1L, 10L, 100.0), (2L, 20L, 200.0), (3L, 10L, 300.0)).toDF("id", "k", "v"))
    val dim = LakeTable(spark, tmp())
      .write(Seq((10L, "a"), (20L, "b")).toDF("k", "name"))
    val mv = MaterializedJoin(spark, fact, dim, tmp(), "id", "k",
      emitChangeFeed = true)
    mv.initialize()
    // the aggregate view stacks on the JOIN view's own change feed:
    // per-name decimal totals over the joined rows
    val agg = MaterializedAgg(spark, LakeTable(spark, mv.viewPath), tmp(),
      keys = Seq("name"), sums = Map("total" -> col("v").cast("decimal(18,2)")))
    agg.initialize()
    def aggState: Map[String, (Long, Double)] = agg.read.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[java.math.BigDecimal](2).doubleValue)).toMap
    assert(aggState === Map("a" -> (2L, 400.0), "b" -> (1L, 200.0)))
    // fact + dim deltas flow through TWO incremental refreshes — no
    // recompute anywhere in the pipeline
    fact.upsert(Seq((4L, 20L, 50.0)).toDF("id", "k", "v"), Seq("id"), changeFeed = true)
    fact.delete(col("id") === 1L, changeFeed = true)
    dim.update(Map("name" -> lit("B")), col("k") === 20L, changeFeed = true)
    mv.refresh()
    agg.refresh()
    assert(snap(mv) === direct(mv))
    // joined state: (3,10,300,a), (2,20,200,B), (4,20,50,B)
    assert(aggState === Map("a" -> (1L, 300.0), "B" -> (2L, 250.0)))
  }

  test("a multi-version backlog folds to final state per key before applying") {
    val fact = LakeTable(spark, tmp())
      .write(Seq((1L, 10L, 1.0)).toDF("id", "k", "v"))
    val dim = LakeTable(spark, tmp())
      .write(Seq((10L, "a")).toDF("k", "name"))
    val mv = MaterializedJoin(spark, fact, dim, tmp(), "id", "k")
    mv.initialize()
    // three versions against the SAME pk: update, delete, re-insert —
    // only the final state may land
    fact.update(Map("v" -> lit(2.0)), col("id") === 1L, changeFeed = true)
    fact.delete(col("id") === 1L, changeFeed = true)
    fact.upsert(Seq((1L, 10L, 9.0)).toDF("id", "k", "v"), Seq("id"), changeFeed = true)
    mv.refresh()
    assert(snap(mv) === Set((1L, 10L, 9.0, "a")))
    // and a key whose FINAL state is deleted stays deleted
    fact.upsert(Seq((2L, 10L, 5.0)).toDF("id", "k", "v"), Seq("id"), changeFeed = true)
    fact.delete(col("id") === 2L, changeFeed = true)
    mv.refresh()
    assert(snap(mv) === Set((1L, 10L, 9.0, "a")))
  }

  test("joinKey clustering keeps a dim-delta refresh file-local and exact") {
    // 400 fact rows over 8 join keys, ids scattered across keys so a
    // pk-clustered layout would smear any one key's cascade everywhere
    val fact = LakeTable(spark, tmp()).write(
      (0L until 400L).map(i => (i, i % 8, i * 1.0)).toDF("id", "k", "v").repartition(4))
    val dim = LakeTable(spark, tmp())
      .write((0L until 8L).map(k => (k, s"n$k")).toDF("k", "name"))
    val viewPath = tmp()
    val mv = MaterializedJoin(spark, fact, dim, viewPath, "id", "k")
    mv.initialize(clusterBy = Some("k"), numFiles = Some(8))
    val view = LakeTable(spark, viewPath)
    assert(snap(mv) === direct(mv))

    // one dim key changes: the cascade touches 50 rows that all live in
    // ~1 of the 8 k-clustered files — the merge must prune on k
    dim.update(Map("name" -> lit("X")), col("k") === 3L, changeFeed = true)
    mv.refresh()
    assert(snap(mv) === direct(mv))
    assert(mv.read.where(col("k") === 3L).select("name").distinct()
      .as[String].collect().toSeq === Seq("X"))
    val merge = view.history.where(col("operation") === "MERGE")
      .orderBy(col("version").desc)
      .select("operationParameters.selective", "operationParameters.filesRewritten",
        "operationParameters.filesKept")
      .collect().head
    assert(merge.getString(0) === "true", "dim-delta merge must take the selective path")
    val rewritten = merge.getString(1).toInt
    val kept = merge.getString(2).toInt
    assert(rewritten <= 2 && kept >= 6,
      s"joinKey clustering should localize the cascade: rewrote $rewritten, kept $kept")

    // a dim DELETE cascades through the same pruned path
    dim.delete(col("k") === 5L, changeFeed = true)
    mv.refresh()
    assert(snap(mv) === direct(mv))
    assert(!mv.read.select("k").as[Long].collect().contains(5L))
  }

}
