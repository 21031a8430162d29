package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .components(edges.toDF("src", "dst"), maxIter)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("cliques and chains collapse to min-id components") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path needs diameter rounds and still converges") {
    // path 9-8-7-...-1: min label travels one hop per round
    val path = (1L to 8L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.values.toSet == Set(1L))
    assert(labels.keySet == (1L to 9L).toSet)
  }

  test("maxIter too small fails loudly instead of returning wrong labels") {
    val path = (1L to 8L).map(i => (i, i + 1))
    assertThrows[IllegalArgumentException](cc(path, maxIter = 3))
  }

  private def ccStar(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .componentsStar(edges.toDF("src", "dst"), maxIter)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("star contraction matches plain propagation on cliques and chains") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
    assert(ccStar(edges) == cc(edges))
  }

  test("self-loop-only nodes and empty graphs behave identically in both algorithms") {
    val withLoop = Seq((5L, 5L), (2L, 3L))
    assert(ccStar(withLoop) == Map(5L -> 5L, 2L -> 2L, 3L -> 2L))
    assert(cc(withLoop) == Map(5L -> 5L, 2L -> 2L, 3L -> 2L))
    assert(ccStar(Seq.empty[(Long, Long)]).isEmpty)
    assert(cc(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("reliable checkpointDir produces identical components and leaves RDD checkpoints behind") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 7L))
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val reliable = ConnectedComponents
      .components(edges.toDF("src", "dst"), checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == cc(edges))
    val star = ConnectedComponents
      .componentsStar(edges.toDF("src", "dst"), checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == reliable)
    // the cut really went through the reliable path: checkpoint data on disk
    def files(f: java.io.File): Int =
      if (f.isFile) 1 else Option(f.listFiles()).map(_.map(files).sum).getOrElse(0)
    assert(files(new java.io.File(dir)) > 0, s"no checkpoint files under $dir")
  }

  test("checkpoint scope restores the session's prior checkpoint dir — including None") {
    import spark.implicits._
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_scope").toString
    try {
      // session with NO checkpoint dir: the run must not leak its
      // cc-<uuid> subdir into the session-global setting
      sc.setCheckpointDir(null)
      ConnectedComponents.components(edges, checkpointDir = Some(dir)).collect()
      assert(sc.getCheckpointDir.isEmpty,
        s"leaked checkpoint dir ${sc.getCheckpointDir}")
      // session WITH a prior dir: restored under the same tree (Spark's
      // setCheckpointDir nests a fresh UUID subdir on every call, so
      // byte-identical restore is impossible via the public API — the
      // guarantee is that later checkpoints land under the USER'S dir,
      // not under this run's cc-<uuid>)
      val kept = java.nio.file.Files.createTempDirectory("graft_cc_prior").toString
      sc.setCheckpointDir(kept)
      val before = sc.getCheckpointDir.get
      ConnectedComponents.components(edges, checkpointDir = Some(dir)).collect()
      assert(sc.getCheckpointDir.exists(_.startsWith(before)),
        s"expected a dir under $before, got ${sc.getCheckpointDir}")
    } finally sc.setCheckpointDir(prior.orNull)
  }

  test("star contraction matches propagation on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(ccStar(edges) == cc(edges, maxIter = 80))
  }

  test("star contraction handles a 256-node path in logarithmic rounds") {
    // plain propagation would need 256 rounds; star needs ~log2(256)
    val path = (1L to 255L).map(i => (i, i + 1))
    val labels = ccStar(path, maxIter = 15)
    assert(labels.values.toSet == Set(1L))
    assert(labels.keySet == (1L to 256L).toSet)
  }

  test("dedup clusters over planted near-dups are transitive") {
    val out = ConnectedComponents.dedupClusters(spark, sf0001).collect()
    assert(out.nonEmpty)
    // every member's component is the min doc_id of its cluster
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (comp, rows) =>
      assert(rows.map(_.getLong(0)).min == comp)
      assert(rows.forall(_.getLong(2) == rows.length))
      assert(rows.length >= 2) // only clustered docs appear
    }
  }

  test("component ids are stable across the declared query and raw pairs") {
    val pairs = graft.text.Dedup.ngramJaccardPairs(
      graft.core.Tables(spark, sf0001).documents, "doc_id", "text", n = 3, threshold = 0.8)
    val nodes = pairs.select(col("a_id")).union(pairs.select(col("b_id")))
      .distinct().count()
    assert(ConnectedComponents.dedupClusters(spark, sf0001).count() == nodes)
  }
}
