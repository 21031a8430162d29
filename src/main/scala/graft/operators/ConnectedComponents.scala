package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed connected components by iterative min-label propagation —
  * the clustering step a dedup pipeline needs AFTER pair generation:
  * near-dup pairs (A,B), (B,C) must collapse into ONE surviving document,
  * which requires the transitive closure, not just the pairs. Reference's
  * dedup surface stops at pair lists (SURVEY §2 M2); this completes it.
  *
  * Algorithm: every node starts labeled with itself; each round, every
  * node takes the min of its own label and its neighbors' labels; stop
  * when the label sum stops changing. Rounds = graph diameter, and each
  * round is one shuffled join + one aggregate. Near-dup graphs are piles
  * of tiny cliques (diameter ~2-3), so this converges in a handful of
  * rounds at any corpus size; for adversarial long-path graphs the
  * alternating large-star/small-star contraction (Kiveris et al., "CC in
  * MapReduce and Beyond") halves the diameter per round — the same loop
  * below with a two-sided propagate — documented as the escalation path.
  *
  * Scale notes: `localCheckpoint(eager)` after every round truncates the
  * lineage (an iterative plan otherwise re-derives all prior rounds each
  * action, exploding at round ~10); the convergence probe aggregates to
  * ONE decimal row per round (no overflow on bigint ids, no collect of
  * labels). The symmetrized edge set is checkpointed once and reused by
  * every round's join.
  */
object ConnectedComponents {

  type Q = (SparkSession, String) => DataFrame

  /** Lineage cut per round. `localCheckpoint` keeps blocks on executors —
    * fast, right for interactive jobs, but an executor loss mid-iteration
    * kills the whole run. For multi-hour 100 TB jobs pass `checkpointDir`
    * (HDFS/S3): rounds then persist via reliable `checkpoint()`, so the
    * job replays from the last round, not from zero, after a lost
    * executor. Each run writes under its own `cc-<uuid>` subdirectory —
    * delete it once the RESULT has been consumed (the final labels still
    * read from it); intermediate rounds also live there rather than
    * leaking into a shared dir. The SparkContext checkpoint-dir setting
    * is session-global, so [[withCheckpointScope]] restores any previous
    * value once the (eager) iteration finishes.
    */
  private def cutter(spark: SparkSession, checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(_) => df => df.checkpoint(eager = true)
      // SERIALIZED memory+disk, not the default deserialized level: the
      // checkpointed edge table is standing state across every round,
      // and deserialized row objects pin the unified pool at large |E|
      // (Graph.CheckpointLevel documents the measured
      // AGGREGATE_OUT_OF_MEMORY this causes on the sibling kernel).
      // LAZY (eager = false): the logical plan is cut at creation either
      // way; every cut here is immediately followed by a full-scan
      // action (labelSum / signature), which materializes and persists
      // the blocks in ONE job instead of eager's two — one saved pass
      // per iteration (Graph.pageRank has the full rationale). Reliable
      // checkpoints (the Some branch) stay eager: recovery semantics
      // want the cut durable before the round is declared done.
      case None => df => df.localCheckpoint(false,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }

  private def withCheckpointScope[T](
      spark: SparkSession, checkpointDir: Option[String])(body: => T): T =
    checkpointDir match {
      case None => body
      case Some(dir) =>
        val sc = spark.sparkContext
        val prev = sc.getCheckpointDir
        sc.setCheckpointDir(s"$dir/cc-${java.util.UUID.randomUUID()}")
        // restore BOTH cases: when the session had no checkpoint dir,
        // explicitly unset it (setCheckpointDir(null) → None) — leaving
        // it pointed at this run's cc-<uuid> subdir would make later
        // unrelated rdd.checkpoint() calls write into (and depend on)
        // this run's directory
        try body
        finally sc.setCheckpointDir(prev.orNull)
    }

  /** Components of an undirected graph given as an edge list.
    *
    * @param edges DataFrame with two long columns `src`, `dst`
    * @param checkpointDir reliable checkpoint location for long jobs
    *                      (see [[cutter]]); executor-local when absent
    * @return (node, component) — component = min node id reachable
    */
  def components(
      edges: DataFrame,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame =
      withCheckpointScope(edges.sparkSession, checkpointDir) {
    val cut = cutter(edges.sparkSession, checkpointDir)
    // PRE-PARTITIONED on src before the lineage cut: localCheckpoint
    // preserves physical partitioning, so the per-round propagation join
    // never re-shuffles the (big) symmetric edge table — one extra
    // up-front exchange buys one saved edge shuffle per round (the
    // labels side arrives co-partitioned from its own groupBy(node))
    val sym = cut(edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))
      .distinct()
      .repartition(col("src")))

    // sum over zero rows is SQL NULL — normalize so the empty graph
    // converges immediately instead of NPE-ing on compareTo
    def labelSum(labels: DataFrame): java.math.BigDecimal = {
      val s = labels.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }

    var labels = cut(sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val propagated = sym
        .join(labels, sym("src") === labels("node"))
        .select(sym("dst").as("node"), col("label"))
      val next = cut(propagated.union(labels.select(col("node"), col("label")))
        .groupBy(col("node"))
        .agg(min(col("label")).as("label")))
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Components by alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the escalation path for graphs whose diameter makes
    * plain propagation too slow: each large+small round roughly halves
    * path lengths, so rounds grow with log(diameter) instead of
    * diameter. Each half-round is one aggregate + one join, same
    * per-round cost shape as [[components]].
    *
    *   - large-star(u): every neighbor v > u re-points to m(u), the
    *     minimum of u's neighborhood (including u itself);
    *   - small-star(u), over edges oriented high->low: every smaller
    *     neighbor (and u) re-points to the minimum smaller neighbor.
    *
    * Both transforms preserve connectivity and strictly shrink a
    * monotone potential, converging to canonical stars (node -> root).
    */
  def componentsStar(
      edges: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame =
      withCheckpointScope(edges.sparkSession, checkpointDir) {
    val cut = cutter(edges.sparkSession, checkpointDir)
    def canon(e: DataFrame): DataFrame =
      e.where(col("src") =!= col("dst"))
        .select(
          greatest(col("src"), col("dst")).as("hi"),
          least(col("src"), col("dst")).as("lo"))
        .distinct()

    // one round = large-star then small-star, both on high->low edges
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val joined = e.join(mins, "hi")
      joined.select(col("lo").as("src"), col("m").as("dst"))
        .union(joined.select(col("hi").as("src"), col("m").as("dst")))
    }

    val typed = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // canon() drops self-loops, so remember every mentioned node — a node
    // whose only edge is (n, n) must still come back as its own component
    // (matching [[components]])
    val allNodes = cut(typed.select(col("src").as("node"))
      .union(typed.select(col("dst").as("node")))
      .distinct())
    var cur = cut(canon(typed))

    // decimal arithmetic BEFORE the multiply: hi*31 in long would wrap
    // for ids above ~3e17 (e.g. 64-bit fingerprint ids) and break the
    // monotone-potential argument the convergence test relies on
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(
        count(lit(1)),
        sum(col("hi").cast("decimal(38,0)") * lit(31) + col("lo").cast("decimal(38,0)"))
      ).head()
      (r.getLong(0), r.getDecimal(1))
    }

    var prev = signature(cur)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = cut(canon(smallStar(canon(largeStar(cur)))))
      val s = signature(next)
      converged = s._1 == prev._1 &&
        ((s._2 == null && prev._2 == null) ||
          (s._2 != null && prev._2 != null && s._2.compareTo(prev._2) == 0))
      prev = s
      cur = next
      i += 1
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")
    // cur is now canonical: every edge points node -> component root;
    // nodes canon() dropped (self-loop-only) fall back to themselves
    val mapped = cur.select(col("hi").as("node"), col("lo").as("component"))
    allNodes
      .join(mapped, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** Declared query: transitive near-dup clusters over the exact 3-gram
    * Jaccard >= 0.8 pair graph on `documents` (the same deterministic
    * pair generation as q_ngram_jaccard), one row per clustered doc with
    * its component id (min doc_id in the cluster) and the cluster size.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = graft.text.Dedup.ngramJaccardPairs(
      Tables.spreadScan(Tables(spark, sfDir).documents), "doc_id", "text", n = 3, threshold = 0.8)
    val comp = components(pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    comp
      .join(sizes, "component")
      .select(col("node").as("doc_id"), col("component"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Survivor SELECTION per near-dup cluster — the policy step after
    * clustering that real pipelines run: keep the HIGHEST-QUALITY member
    * (min-id is the test-friendly default elsewhere; production keeps
    * the best copy and drops mirrors/truncations). Quality is the same
    * oracled composite [[graft.text.TextFunctions.qualityScore]] the
    * lang-quality query uses; ties break on doc_id so the argmax is
    * total. One window over the clustered docs (a small fraction of the
    * corpus) picks the survivor; sizes come from the same component
    * frame.
    */
  def dedupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.spreadScan(Tables(spark, sfDir).documents)
    val pairs = graft.text.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.8)
    val comp = components(pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    val quality = docs.select(col("doc_id"),
      graft.text.TextFunctions.qualityScore(col("text")).as("quality"))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    comp
      .join(quality, col("node") === col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .join(sizes, "component")
      .select(col("component"), col("cluster_size"),
        col("doc_id").as("survivor_doc"), col("quality").as("survivor_quality"))
      .orderBy(col("component"))
  }

  def queries: Map[String, Q] = Map(
    "q_dedup_survivors" -> (dedupSurvivors _),
    "q_dedup_clusters" -> (dedupClusters _)
  )

  /** DuckDB mirrors the transitive closure with a recursive CTE over the
    * same pair SQL as the q_ngram_jaccard oracle (min reachable id).
    */
  def oracles: Map[String, String] = Map(
    "q_dedup_survivors" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, text,
        |        string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents),
        |s AS (SELECT doc_id, list_distinct([array_to_string(ts[i:i+2], ' ')
        |                                    for i in range(1, len(ts)-1)]) AS sh
        |      FROM t WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |p AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) common
        |      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM p
        |  JOIN (SELECT doc_id, len(sh) n FROM s) la ON la.doc_id = a_id
        |  JOIN (SELECT doc_id, len(sh) n FROM s) lb ON lb.doc_id = b_id
        |  WHERE common * 1.0 / (la.n + lb.n - common) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
        |q AS (SELECT doc_id,
        |  round(
        |    0.4 * least(len(ts) / 20.0, 1.0)
        |  + 0.2 * (1.0 - least(round(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
        |                             * 1.0 / greatest(length(text), 1), 6) * 5, 1.0))
        |  + 0.4 * least(len(list_distinct(ts)) * 1.0 / greatest(len(ts), 1) * 2, 1.0)
        |  , 6) AS quality
        |  FROM t),
        |ranked AS (
        |  SELECT c.node, c.component, q.quality,
        |    row_number() OVER (PARTITION BY component ORDER BY quality DESC, node) AS rk
        |  FROM comp c JOIN q ON q.doc_id = c.node),
        |sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
        |SELECT r.component, s2.cluster_size, r.node AS survivor_doc,
        |  r.quality AS survivor_quality
        |FROM ranked r JOIN sizes s2 USING (component)
        |WHERE rk = 1 ORDER BY r.component""".stripMargin,
    "q_dedup_clusters" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts FROM documents),
        |s AS (SELECT doc_id, list_distinct([array_to_string(ts[i:i+2], ' ')
        |                                    for i in range(1, len(ts)-1)]) AS sh
        |      FROM t WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |p AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) common
        |      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM p
        |  JOIN (SELECT doc_id, len(sh) n FROM s) la ON la.doc_id = a_id
        |  JOIN (SELECT doc_id, len(sh) n FROM s) lb ON lb.doc_id = b_id
        |  WHERE common * 1.0 / (la.n + lb.n - common) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
        |SELECT c.node AS doc_id, c.component, s2.cluster_size
        |FROM comp c
        |JOIN (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component) s2
        |  USING (component)
        |ORDER BY doc_id""".stripMargin
  )
}
