package graft

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.text.Dedup

/** Near-dup scale probe (not part of the driver contract): replicates the
  * documents table REP times (replicas are genuine near-dups of their
  * original — a realistic crawl) and plants a shared boilerplate prefix on
  * 5% of documents (the classic hot-shingle skew of web data: site
  * disclaimers, license headers). Then times the uncapped vs df-capped
  * n-gram Jaccard paths. The uncapped path pays O(df²) join rows for every
  * boilerplate shingle; the cap drops those shingles and bounds the hot
  * key. Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleProbe [rep]
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(32)

    val docs = Tables(spark, sfDir).documents.select("doc_id", "text")
    val boiler = "this document is provided as is without warranty of any kind " +
      "either express or implied see the license for details"
    val replicated = docs
      .crossJoin(spark.range(rep).select(col("id").as("r")))
      .select(
        (col("doc_id") * rep + col("r")).as("doc_id"),
        concat(
          // 5% of originals carry the shared boilerplate prefix
          when(col("doc_id") % 20 === 0, lit(boiler + " ")).otherwise(lit("")),
          // replica marker: a few leading tokens differ, so replicas are
          // near-dups (j ~ 0.9+) rather than exact dups
          when(col("r") > 0, concat(lit("replica marker "), col("r"), lit(" ")))
            .otherwise(lit("")),
          col("text")
        ).as("text"))
      .cache()
    val n = replicated.count()
    println(s"corpus: $n docs (rep=$rep)")

    def time(label: String)(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","sec":$sec%.2f,"pairs":$rows}""")
      (sec, rows)
    }

    val (uncappedSec, uncappedPairs) = time("ngram_jaccard_uncapped") {
      Dedup.ngramJaccardPairs(replicated, "doc_id", "text", 3, 0.8).count()
    }
    // cap chosen ABOVE the organic df ceiling (max organic df ~25 at sf0.1,
    // x10 replication = 250) and BELOW the planted boilerplate (df=2500):
    // the cap should kill pathological keys, not the corpus's natural
    // phrase repetition — a cap inside the organic df range guts `common`
    // and silently zeroes recall (measured: cap=100 -> 0 pairs here)
    val (cappedSec, cappedPairs) = time("ngram_jaccard_capped_df500") {
      Dedup.ngramJaccardPairs(replicated, "doc_id", "text", 3, 0.8,
        maxShingleDf = Some(500)).count()
    }
    val (bandedSec, bandedPairs) = time("minhash_banded") {
      Dedup.minhashBandedPairs(replicated, "doc_id", "text", 3, 0.8).count()
    }
    // span-level exact-substring dedup over the replicated corpus: the
    // 8-gram inverted index meets real duplication here (replicas share
    // almost every gram with their original), so this measures the
    // worst-ish case: nearly all positions of every replica are covered
    val (spanSec, spanDups) = time("span_dedup_8gram") {
      graft.text.CorpusOps.coveredPositions(replicated, "doc_id", "text", 8).count()
    }
    // hot-gram routing in its target scenario: the corpus's PLANTED
    // boilerplate prefix (5% of originals, df=2500 grams after x10
    // replication — the license-header shape whose single window
    // partition can't be split at scale); cap = 1000 routes exactly
    // those grams through the closed-form broadcast branch while
    // everything else keeps the window. Same answer, skew-immune plan.
    val (spanRoutedSec, spanRoutedDups) = time("span_dedup_routed_df1000") {
      graft.text.CorpusOps.coveredPositions(replicated, "doc_id", "text", 8,
        hotGramDf = Some(1000)).count()
    }
    require(spanRoutedDups == spanDups,
      s"routing changed the answer: $spanRoutedDups != $spanDups")
    println(
      f"""{"metric":"neardup_scale_probe","rep":$rep,"docs":$n,""" +
        f""""uncapped_sec":$uncappedSec%.2f,"uncapped_pairs":$uncappedPairs,""" +
        f""""capped_sec":$cappedSec%.2f,"capped_pairs":$cappedPairs,""" +
        f""""banded_sec":$bandedSec%.2f,"banded_pairs":$bandedPairs,""" +
        f""""span_sec":$spanSec%.2f,"span_dup_positions":$spanDups}""")
    spark.stop()
  }
}
