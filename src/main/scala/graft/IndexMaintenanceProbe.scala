package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.LakeTable
import graft.text.{InvertedIndex, IvfIndex}

/** Standing-index maintenance scale probe (not part of the driver
  * contract): a synthetic versioned corpus of `n` rows gets a stamped
  * BM25 index and a stamped IVF index, then a SMALL change-feed delta
  * (0.1% updates + deletes + inserts) is folded in two ways — (a) the
  * incremental `applyChanges` the freshness contract prescribes and (b)
  * the full rebuild it replaces. The claim under test is
  * applyChanges = O(delta) + O(touched postings files): its cost must
  * track the delta, not the corpus, so the apply:rebuild gap must WIDEN
  * as `n` grows — the number that justifies `startMaintenanceStream`
  * folding per micro-batch instead of re-indexing on a cadence. The
  * per-layer evidence (files rewritten vs kept by the removal merges)
  * prints beside the times. Results recorded in BASELINE.md.
  *
  * Usage: runMain graft.IndexMaintenanceProbe [n]   (default 100000)
  */
object IndexMaintenanceProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_idxprobe")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // deterministic synthetic corpus: 64-d pseudo-vectors + token text
    // derived from the id (no RNG state to thread through executors)
    val dims = (0 until 64).map(j => sin(col("id") * lit(0.37 + j * 0.011) + lit(j)).cast("float"))
    val text = concat_ws(" ", (0 until 12).map(k =>
      concat(lit("tok"), pmod(col("id") * lit(31 + k), lit(5000)))): _*)
    val corpus = spark.range(n)
      .select(col("id"), array(dims: _*).as("vec"), text.as("text"))
      .localCheckpoint(true)

    val vecBase = LakeTable(spark, s"$base/vecs").write(corpus.select("id", "vec"))
    val docBase = LakeTable(spark, s"$base/docs").write(corpus.select("id", "text"))

    val ivfDir = s"$base/ivf"
    val tIvfBuild = timed(IvfIndex.build(vecBase, "id", "vec", ivfDir,
      nCells = 64, seed = 42L, sampleFraction = 0.2))
    val bmDir = s"$base/bm25"
    val tBmBuild = timed(InvertedIndex.build(docBase, "id", "text", bmDir))

    // the delta: 0.1% of ids updated (new vector / new text), a few
    // deletes, a few brand-new ids — all through the change feed, the
    // shape a CDC-fed corpus emits per micro-batch
    val d = math.max(n / 1000L, 10L)
    val updIds = spark.range(d).select((col("id") * 997L % n).as("id"))
    val updVec = updIds.join(corpus.select("id", "vec"), Seq("id"))
      .select(col("id"), expr("transform(vec, x -> float(-x))").as("vec"))
    val updText = updIds.select(col("id"),
      concat(lit("fresh"), col("id"), lit(" tokens only")).as("text"))
    vecBase.upsert(updVec, Seq("id"), changeFeed = true)
    vecBase.delete(col("id") === 1L, changeFeed = true)
    docBase.upsert(updText, Seq("id"), changeFeed = true)
    docBase.delete(col("id") === 1L, changeFeed = true)

    val tIvfApply = timed(IvfIndex.applyChanges(vecBase, "id", "vec", ivfDir))
    val tBmApply = timed(InvertedIndex.applyChanges(docBase, "id", "text", bmDir))
    // what each apply replaced: a from-scratch rebuild of the same index
    val tIvfRebuild = timed(IvfIndex.build(vecBase, "id", "vec", s"$base/ivf2",
      nCells = 64, seed = 42L, sampleFraction = 0.2))
    val tBmRebuild = timed(InvertedIndex.build(docBase, "id", "text", s"$base/bm2"))

    // tombstone evidence: the CDC-sized delta must have removed via
    // deletion vectors (no postings file rewritten), not a merge
    val ivfDv = LakeTable(spark, s"$ivfDir/postings").hasDeletionVectors
    val bmDv = LakeTable(spark, s"$bmDir/postings").hasDeletionVectors

    println(
      s"""{"probe":"index_maintenance","n":$n,"delta":$d,""" +
        f""""ivf_build_s":$tIvfBuild%.2f,"ivf_apply_s":$tIvfApply%.2f,""" +
        f""""ivf_rebuild_s":$tIvfRebuild%.2f,"ivf_speedup":${tIvfRebuild / tIvfApply}%.2f,""" +
        s""""ivf_removed_via_dv":$ivfDv,""" +
        f""""bm25_build_s":$tBmBuild%.2f,"bm25_apply_s":$tBmApply%.2f,""" +
        f""""bm25_rebuild_s":$tBmRebuild%.2f,"bm25_speedup":${tBmRebuild / tBmApply}%.2f,""" +
        s""""bm25_removed_via_dv":$bmDv}""")
    spark.stop()
  }
}
