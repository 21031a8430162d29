package graft

import graft.core.{GraftSession, Tables}
import graft.text.Bpe

/** BPE merge-learning scale probe (not part of the driver contract):
  * replicates the documents table REP times (content unchanged — BPE pair
  * counts scale linearly, which is exactly the point: merge RANKS are
  * invariant under replication, so the full-corpus result is a known
  * ground truth for the sampled run), then measures full-corpus learning
  * against seeded sample-based learning on wall time and rank agreement.
  *
  * Agreement = Spearman rank correlation over the shared merge pairs +
  * the overlap fraction of the two rule sets. Results in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BpeProbe [rep [numMerges [frac]]]
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val numMerges = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val frac = args.drop(2).headOption.map(_.toDouble).getOrElse(0.05)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val base = Tables(spark, sfDir).documents.select("doc_id", "text")
    val corpus = base
      .crossJoin(spark.range(rep).select(col("id").as("r")))
      .select((col("doc_id") * rep + col("r")).as("doc_id"), col("text"))
      .localCheckpoint(true)
    println(s"corpus: ${corpus.count()} docs, numMerges=$numMerges")

    def time(label: String, frac: Double): Seq[Bpe.Merge] = {
      val t0 = System.nanoTime()
      val merges = Bpe.learnMerges(corpus, "text", numMerges, sampleFraction = frac)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","sec":$sec%.2f,"rules":${merges.size}}""")
      merges
    }

    val full = time("bpe_full", 1.0)
    val sampled = time(s"bpe_sampled_$frac", frac)

    val fullRank = full.map(m => (m.left, m.right) -> m.rank).toMap
    val sampRank = sampled.map(m => (m.left, m.right) -> m.rank).toMap
    val shared = fullRank.keySet.intersect(sampRank.keySet).toSeq
    val overlap = shared.size.toDouble / full.size
    // Spearman over shared pairs' ranks
    def ranks(m: Map[(String, String), Int]) = {
      val sorted = shared.sortBy(m)
      sorted.zipWithIndex.map { case (p, i) => p -> i.toDouble }.toMap
    }
    val (ra, rb) = (ranks(fullRank), ranks(sampRank))
    val n = shared.size.toDouble
    val spearman =
      if (shared.size < 2) 1.0
      else 1.0 - 6.0 * shared.map(p => math.pow(ra(p) - rb(p), 2)).sum / (n * (n * n - 1))
    // head agreement: the first 10 full-corpus rules (the high-frequency,
    // rank-stable region) found by the sampled run, in the same order
    val head = full.sortBy(_.rank).take(10).map(m => (m.left, m.right))
    val headShared = head.filter(sampRank.contains)
    val headOrdered = headShared.sortBy(sampRank) == headShared
    println(f"""{"probe":"bpe_agreement","overlap":$overlap%.3f,"spearman":$spearman%.3f,"shared":${shared.size},"head10_found":${headShared.size},"head10_in_order":$headOrdered}""")

    // encode-path comparison at this rule count: the per-rank fold
    // expression tree vs the single rank-map expression
    def encTime(label: String,
        f: (org.apache.spark.sql.DataFrame, String, Seq[Bpe.Merge]) =>
          org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val checksum = f(corpus, "text", full)
        .agg(sum(size(col("bpe_tokens")))).collect().head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","sec":$sec%.2f,"total_tokens":$checksum}""")
      checksum
    }
    val a = encTime("bpe_encode_folds", Bpe.encode)
    val b = encTime("bpe_encode_scalable", Bpe.encodeScalable)
    require(a == b, s"encode paths disagree: $a != $b")
    spark.stop()
  }
}
