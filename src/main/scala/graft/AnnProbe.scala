package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.text.{Ivf, Similarity}

/** ANN scale probe (not part of the driver contract): replicates the
  * embeddings table REP times with a seeded deterministic perturbation —
  * replicas are near-neighbors of their original, mimicking a corpus with
  * natural cluster structure — then measures exact brute-force cosine
  * top-k against IVF and hyperplane-LSH on wall time and recall@k.
  *
  * Recall = |approx ∩ exact| / |exact| over all query-neighbor pairs.
  * Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.AnnProbe [rep]
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val k = 10
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    // replica r of vector v: every component nudged by a deterministic
    // per-(id, r, dim) pseudo-random epsilon — near-dup of the original
    val corpus = base
      .crossJoin(spark.range(rep).select(col("id").as("r")))
      .select(
        (col("vec_id") * rep + col("r")).as("vec_id"),
        transform(
          col("embedding"),
          (x, i) =>
            x + when(col("r") === 0, lit(0.0f)).otherwise(
              (pmod(xxhash64(col("vec_id"), col("r"), i), lit(1000)).cast("float")
                / lit(10000.0f)) - lit(0.05f))
        ).as("embedding"))
      .localCheckpoint(true)
    val n = corpus.count()
    // ~100 original vectors as queries regardless of rep
    val queries = corpus.where(col("vec_id") % (20L * rep) === 0)
    val nq = queries.count()
    println(s"corpus: $n vectors, $nq queries, k=$k")

    def time(label: String)(body: => DataFrame): (Double, Set[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val pairs = body.select(col("q_id"), col("n_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","sec":$sec%.2f,"pairs":${pairs.size}}""")
      (sec, pairs)
    }

    val (bruteSec, exact) = time("brute") {
      Similarity.bruteTopK(corpus, queries, "vec_id", "embedding", k)
    }
    val (ivfSec, ivfPairs) = time("ivf_c64_p8") {
      Ivf.ivfTopK(corpus, queries, "vec_id", "embedding", k, nCells = 64, nProbe = 8)
    }
    val (ivfSampSec, ivfSampPairs) = time("ivf_c64_p8_sample5pct") {
      Ivf.ivfTopK(corpus, queries, "vec_id", "embedding", k, nCells = 64, nProbe = 8,
        buildSampleFraction = 0.05)
    }
    val (lshSec, lshPairs) = time("lsh_6x8") {
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
        dim = 64, k = k, nPlanes = 6, nTables = 8)
    }
    // PQ measured in its two real phases: BUILD (codebook fit + encode —
    // write-once, a standing index like IVF's saveIndex) and QUERY (ADC
    // over codes + exact re-rank of the shortlist — the recurring cost;
    // codes are 16x smaller than raw vectors in serving memory)
    val pqBuildT0 = System.nanoTime()
    val pqBooks = graft.text.Pq.fitCodebooks(corpus, "embedding",
      m = 16, k = 16, sampleFraction = 0.05)
    val pqCodes = graft.text.Pq.encode(corpus, pqBooks, "embedding")
      .select(col("vec_id"), col("codes")).localCheckpoint(true)
    val pqBuildSec = (System.nanoTime() - pqBuildT0) / 1e9
    println(f"""{"probe":"pq_build_m16_k16","sec":$pqBuildSec%.2f}""")
    val (pqSec, pqPairs) = time("pq_query_refine") {
      val shortlist = math.max(50, (n / 20).toInt)
      val cands = graft.text.Pq.adcTopK(pqCodes, queries, pqBooks,
        "vec_id", "embedding", shortlist).select(col("q_id"), col("n_id"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
        .join(broadcast(cands), Seq("n_id"))
        .join(broadcast(queries.select(col("vec_id").as("q_id"),
          col("embedding").as("q_vec"))), Seq("q_id"))
        .select(col("q_id"), col("n_id"),
          graft.functions.VectorFunctions.cosineSim(col("q_vec"), col("n_vec")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
    }
    // IVF-PQ composition: both quantizers fit on 5% samples and the
    // (id, cell, codes) serving set materialized — all build-time; the
    // query phase probes cells, ADC-scores only those rows, and
    // exact-re-ranks the shortlist
    val ivfpqBuildT0 = System.nanoTime()
    val ivfpqCenters = Ivf.fitCentroids(
      corpus.select(col("embedding")), "embedding",
      nCells = 64, sampleFraction = 0.05)
    val ivfpqIndex = Ivf.ivfPqIndex(corpus, "vec_id", "embedding",
      ivfpqCenters, pqBooks).localCheckpoint(true)
    val ivfpqBuildSec = (System.nanoTime() - ivfpqBuildT0) / 1e9
    println(f"""{"probe":"ivfpq_build_c64_m16","sec":$ivfpqBuildSec%.2f}""")
    val (ivfpqSec, ivfpqPairs) = time("ivfpq_query_c64_p8_refine") {
      val shortlist = math.max(50, (n / 20).toInt)
      Ivf.ivfPqTopK(corpus, queries, "vec_id", "embedding", k,
        nCells = 64, nProbe = 8, m = 16, pqCells = 16, shortlist = shortlist,
        centers = Some(ivfpqCenters), codebooks = Some(pqBooks),
        index = Some(ivfpqIndex))
    }

    def recall(p: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else p.intersect(exact).size.toDouble / exact.size
    println(
      f"""{"metric":"ann_scale_probe","vectors":$n,"queries":$nq,"k":$k,""" +
        f""""brute_sec":$bruteSec%.2f,""" +
        f""""ivf_sec":$ivfSec%.2f,"ivf_recall":${recall(ivfPairs)}%.4f,""" +
        f""""ivf_sampled_sec":$ivfSampSec%.2f,"ivf_sampled_recall":${recall(ivfSampPairs)}%.4f,""" +
        f""""lsh_sec":$lshSec%.2f,"lsh_recall":${recall(lshPairs)}%.4f,""" +
        f""""pq_build_sec":$pqBuildSec%.2f,"pq_query_sec":$pqSec%.2f,""" +
        f""""pq_recall":${recall(pqPairs)}%.4f,""" +
        f""""ivfpq_build_sec":$ivfpqBuildSec%.2f,"ivfpq_query_sec":$ivfpqSec%.2f,""" +
        f""""ivfpq_recall":${recall(ivfpqPairs)}%.4f}""")
    spark.stop()
  }
}
