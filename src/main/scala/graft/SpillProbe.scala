package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Deep-spill probe (not part of the driver contract; BASELINE.md
  * records its numbers).
  *
  * The round-14 memory-pressure table proved no-OOM under a 10.7x heap
  * squeeze, but its working sets still partially fit in 768m — nothing
  * ever SPILLED, so the claim "at 100 TB the same mechanism degrades to
  * disk spill per partition" was design reasoning, not measurement.
  * This probe forces the spill regime and verifies correctness inside
  * it: sf0.1 lineitem replicated REP times (key-preserving, so every
  * aggregate has closed-form expected values), shuffle partitions
  * pinned LOW (huge per-partition working sets), and the heap chosen by
  * the caller far below the shuffle working set:
  *
  *   sbt -J-Xmx768m "runMain graft.SpillProbe 20 4"
  *
  * Four shuffle-heavy shapes run under a SparkListener that sums
  * `memoryBytesSpilled`/`diskBytesSpilled` across tasks; the probe
  * FAILS if nothing spilled (the run proved nothing) and fails if any
  * result drifts from the replication arithmetic:
  *
  *   - hash AGG: group sums/counts == REP x the unreplicated values
  *     (decimal sums — exact at any accumulation order/spill boundary)
  *   - big SORT: global top-k == unreplicated top-(k/REP) values, each
  *     appearing exactly REP times
  *   - shuffle JOIN: star-join revenue per nation == REP x base
  *   - DISTINCT: countDistinct over replicated == unreplicated (the
  *     key set is unchanged; only the dup volume grows)
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        sbt -J-Xmx768m "runMain graft.SpillProbe [rep [shufflePartitions]]"
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(20)
    val shuffleParts = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master("local[8]")
        .appName("graft-spill")
        .config("spark.sql.shuffle.partitions", shuffleParts.toString)
        // AQE coalescing would merge the already-few partitions; keep
        // the partition plan fixed so the working-set math holds
        .config("spark.sql.adaptive.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          memSpilled.addAndGet(e.taskMetrics.memoryBytesSpilled): Unit
          diskSpilled.addAndGet(e.taskMetrics.diskBytesSpilled): Unit
        }
    })

    val maxHeap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"heap=${maxHeap}m rep=$rep shufflePartitions=$shuffleParts")

    // SMJ everywhere: at 100 TB the dims exceed the broadcast threshold,
    // and a broadcast-hash join never exercises the spillable sort
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val t = Tables(spark, sfDir)
    // WIDE rows on purpose: the spill regime needs per-partition working
    // sets (rows x row-width / shufflePartitions) well past the
    // execution-memory pool, not just many rows
    val li = t.lineitem
    // key-preserving replication, replica id carried: exact-duplicate
    // shapes key off the base columns, unique-per-replica shapes include
    // __r — either way group-level results scale by exactly REP
    val liRep = li.crossJoin(spark.range(rep).select(col("id").as("__r")))

    var failures = 0
    def check(name: String)(cond: Boolean, msg: => String): Unit =
      if (!cond) { failures += 1; println(s"FAIL [$name] $msg") }
      else println(s"ok   [$name]")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(spilled mem=${memSpilled.get / 1048576}M disk=${diskSpilled.get / 1048576}M)")
      r
    }

    val baseRows = li.count()
    val baseKeys = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val baseSum = li.select(
      sum(col("l_extendedprice").cast("decimal(18,2)"))).head().getDecimal(0)

    // ---- 1: OBJECT hash aggregation across the spill boundary ----
    // collect_list per orderkey: each group buffers REP x its line
    // values — ObjectHashAggregate's fallback/spill machinery under a
    // per-partition state of (keys x lists) far past the pool
    locally {
      val got = timed("agg")(
        liRep.groupBy("l_orderkey")
          .agg(collect_list(col("l_extendedprice")).as("ps"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("s"))
          .agg(count(lit(1)).as("groups"),
            sum(size(col("ps"))).as("elems"),
            sum(col("s")).as("total"))
          .head())
      check("agg")(got.getLong(0) == baseKeys &&
        got.getLong(1) == baseRows * rep &&
        got.getDecimal(2).compareTo(
          baseSum.multiply(new java.math.BigDecimal(rep))) == 0,
        s"grouped lists != $rep x base arithmetic: $got")
    }

    // ---- 2: FULL global sort across the spill boundary ----
    // range partition + within-partition sort of WIDE rows, consumed by
    // a per-partition scan (no limit pushdown to dodge the sort); global
    // order = range partitioning across + verified monotonicity within
    locally {
      val (rows, sortedParts, parts) = timed("sort") {
        val sorted = liRep
          .repartitionByRange(shuffleParts, col("l_extendedprice"), col("l_orderkey"))
          .sortWithinPartitions(col("l_extendedprice"), col("l_orderkey"))
        val per = sorted.select(col("l_extendedprice").cast("double").as("p"))
          .mapPartitions { it =>
            var n = 0L; var ok = true; var prev = Double.NegativeInfinity
            while (it.hasNext) {
              val v = it.next().getDouble(0)
              if (v < prev) ok = false
              prev = v; n += 1
            }
            Iterator((n, ok))
          }.collect()
        (per.map(_._1).sum, per.count(_._2), per.length)
      }
      check("sort")(rows == baseRows * rep && sortedParts == parts,
        s"full sort under spill: rows=$rows sortedParts=$sortedParts/$parts")
    }

    // ---- 3: sort-merge star join across the spill boundary ----
    locally {
      def revenue(fact: DataFrame): Map[String, java.math.BigDecimal] =
        fact.join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(t.nation, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
          .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
      val base = revenue(li)
      val got = timed("join")(revenue(liRep))
      check("join")(got.keySet == base.keySet && base.forall { case (k, v) =>
        got(k).compareTo(v.multiply(new java.math.BigDecimal(rep))) == 0
      }, s"star revenue != $rep x base")
    }

    // ---- 4: wide-key DISTINCT across the spill boundary ----
    // every replicated row is unique (replica id in the key), so the
    // distinct's hash state is the full REP x corpus of wide keys
    locally {
      val got = timed("distinct")(
        liRep.select(concat_ws("_", col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_linenumber"), col("__r")).as("k"))
          .distinct().count())
      check("distinct")(got == baseRows * rep,
        s"wide-key distinct: $got vs ${baseRows * rep}")
    }

    // ================= the engine's OWN heavy paths =================
    // The relational shapes above exercise Spark's spillable operators;
    // a 100 TB operator actually runs THIS engine's custom paths memory-
    // tight: a standing-index BUILD (postings sort), a maintenance FOLD,
    // and semanticDedup's within-cell pairing. Each section brackets the
    // spill counters so the claim is per-path, and each asserts content
    // EXACTNESS inside the spill regime (serve == rebuild; survivors ==
    // the closed-form replica arithmetic).

    val idxRep = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val semRep = args.drop(3).headOption.map(_.toInt).getOrElse(100)
    val root = java.nio.file.Files.createTempDirectory("graft_spill_engine").toString

    // ---- 5: standing BM25 index BUILD + maintenance FOLD ----
    locally {
      import graft.sources.LakeTable
      import graft.text.InvertedIndex
      val m0 = memSpilled.get(); val d0 = diskSpilled.get()
      // disjoint-token replication (the DecadeProbe construction): every
      // token carries its replica id, so the postings corpus is idxRep
      // independent sub-corpora — vocabulary and postings volume both
      // scale by idxRep, and serve results have per-replica structure
      val docs = t.documents.select(col("doc_id"), col("text"))
        .crossJoin(spark.range(idxRep).select(col("id").as("__r")))
        .select((col("doc_id") * idxRep + col("__r")).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1x"), col("__r"))).as("text"))
      val base = LakeTable(spark, s"$root/docs")
      base.write(docs.repartition(shuffleParts)): Unit
      val dir = s"$root/idx"
      timed("index_build")(InvertedIndex.build(base, "doc_id", "text", dir))
      // fold: update a slice and add fresh docs, then apply the delta
      val delta = t.documents.select(col("doc_id"), col("text"))
        .limit(500)
        .select((col("doc_id") * idxRep).as("doc_id"),
          concat(col("text"), lit(" freshx0 freshx0")).as("text"))
      base.upsert(delta, Seq("doc_id"), changeFeed = true): Unit
      timed("index_fold")(InvertedIndex.applyChanges(base, "doc_id", "text", dir))
      val rebuilt = s"$root/idx2"
      timed("index_rebuild")(InvertedIndex.build(base, "doc_id", "text", rebuilt))
      def served(d: String) = InvertedIndex.serveBm25(spark, d,
        Seq(1L -> "freshx0", 2L -> "thex1", 3L -> "ax2"), k = 20,
        InvertedIndex.DefaultK1, InvertedIndex.DefaultB)
        .collect().map(_.toString).sorted.toSeq
      check("index_exact")(served(dir) == served(rebuilt),
        "fold under the spill regime diverged from a rebuild")
      check("index_spilled")(
        memSpilled.get() - m0 > 0 || diskSpilled.get() - d0 > 0,
        "index build+fold never spilled — raise idxRep or lower the heap")
    }

    // ---- 6: semanticDedup within-cell pairing ----
    locally {
      import graft.text.Dedup
      val m0 = memSpilled.get(); val d0 = diskSpilled.get()
      val emb = t.embeddings.select(col("vec_id"), col("embedding"))
      // eps high enough that only EXACT duplicates merge; verify that
      // assumption against the base corpus brute-force, so the expected
      // survivor count is closed-form, not hoped-for
      val eps = 0.9999
      val nBase = emb.count()
      val basePairs = emb.as("a").join(emb.as("b"),
          col("a.vec_id") < col("b.vec_id"))
        .where(graft.functions.VectorFunctions.cosineSim(
          col("a.embedding"), col("b.embedding")) >= eps)
        .count()
      check("sem_assumption")(basePairs == 0,
        s"base corpus has $basePairs pairs at cosine >= $eps — raise eps")
      // semRep exact replicas per vector, distinct ids: every replica
      // group is one duplicate cluster, so survivors == nBase exactly
      val corpus = emb.crossJoin(spark.range(semRep).select(col("id").as("__r")))
        .select((col("vec_id") * semRep + col("__r")).as("vec_id"),
          col("embedding"))
        .repartition(shuffleParts)
      val out = timed("semantic_dedup")(
        Dedup.semanticDedup(corpus, "vec_id", "embedding",
          corpusSizeHint = Some(nBase * semRep), eps = eps)
          .select(col("id"), col("keep")).cache())
      val survivors = out.where(col("keep")).count()
      val total = out.count()
      out.unpersist(): Unit
      check("sem_exact")(survivors == nBase && total == nBase * semRep,
        s"semanticDedup under spill: $survivors survivors of $total " +
          s"(want $nBase of ${nBase * semRep})")
      check("sem_spilled")(
        memSpilled.get() - m0 > 0 || diskSpilled.get() - d0 > 0,
        "semanticDedup never spilled — raise semRep or lower the heap")
    }

    val mem = memSpilled.get(); val disk = diskSpilled.get()
    check("spilled")(mem > 0 || disk > 0,
      "nothing spilled — raise rep or lower the heap; this run proved nothing")
    println(s"""{"probe":"spill","heap_mb":$maxHeap,"rep":$rep,""" +
      s""""shuffle_partitions":$shuffleParts,"idx_rep":$idxRep,"sem_rep":$semRep,""" +
      s""""memory_bytes_spilled":$mem,""" +
      s""""disk_bytes_spilled":$disk,"failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
