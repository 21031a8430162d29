package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain single-machine reference BPE (the textbook algorithm, driver
    * only) to pin the distributed trainer against.
    */
  private def referenceMerges(
      corpus: Seq[String], numMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => w.toVector.map(_.toString) -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, f))
        words = words.map { case (syms, n) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          merged -> n
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        i += 1
      }
    }
    out.toSeq
  }

  test("distributed merges equal the single-machine reference") {
    val corpus = Seq(
      "low lower lowest low low",
      "new newer newest new newer",
      "wide wider widest wide")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val dist = Bpe.learnMerges(df, "text", numMerges = 8)
      .map(m => (m.left, m.right, m.freq))
    val ref = referenceMerges(corpus, 8)
    assert(dist === ref)
  }

  test("merges on the real corpus are deterministic and frequency-sane") {
    val docs = Tables(spark, sf0001).documents.where(col("doc_id") < 100)
    val a = Bpe.learnMerges(docs, "text", numMerges = 6)
    val b = Bpe.learnMerges(docs, "text", numMerges = 6)
    assert(a === b, "two runs disagreed")
    assert(a.size === 6)
    // merged symbols really occur: every rule's frequency is positive,
    // and rank-0 is the global argmax so later CREATED symbols can beat it
    assert(a.forall(_.freq > 0))
    assert(a.head.freq === a.map(_.freq).max)
  }

  test("sample-based learning tracks full-corpus merges (ranks agree)") {
    val docs = Tables(spark, sf0001).documents
    val full = Bpe.learnMerges(docs, "text", numMerges = 20)
    val sampled = Bpe.learnMerges(docs, "text", numMerges = 20, sampleFraction = 0.5)
    assert(sampled.size === 20)
    // determinism of the seeded sample
    val again = Bpe.learnMerges(docs, "text", numMerges = 20, sampleFraction = 0.5)
    assert(sampled === again, "seeded sampled learning diverged")

    val fullRank = full.map(m => (m.left, m.right) -> m.rank).toMap
    val sampRank = sampled.map(m => (m.left, m.right) -> m.rank).toMap
    val shared = fullRank.keySet.intersect(sampRank.keySet).toSeq
    assert(shared.size >= 16, // >= 80% of rules survive halving the corpus
      s"only ${shared.size}/20 rules shared between full and sampled learning")
    // Spearman rank correlation over the shared rules >= 0.95: sample
    // noise may swap near-tied neighbors but must not reorder the list
    def ranks(m: Map[(String, String), Int]) =
      shared.sortBy(m).zipWithIndex.map { case (p, i) => p -> i.toDouble }.toMap
    val (ra, rb) = (ranks(fullRank), ranks(sampRank))
    val n = shared.size.toDouble
    val spearman =
      1.0 - 6.0 * shared.map(p => math.pow(ra(p) - rb(p), 2)).sum / (n * (n * n - 1))
    assert(spearman >= 0.95, f"sampled merge ranks drifted: spearman=$spearman%.3f")
  }

  test("standing merges: save/load round-trip, identical tokens, Exchange-free serving") {
    val docs = Tables(spark, sf0001).documents.limit(200)
    val merges = Bpe.learnMerges(docs, "text", numMerges = 12)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_standing").resolve("merges").toString
    Bpe.saveMerges(spark, merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded === merges, "save/load changed the rule table")
    val direct = Bpe.encodeScalable(docs, "text", merges)
      .select(col("doc_id"), col("bpe_tokens"))
    val standing = Bpe.encodeScalable(docs, "text", loaded)
      .select(col("doc_id"), col("bpe_tokens"))
    assert(
      standing.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap ===
        direct.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap,
      "standing rules tokenize differently")
    // the standing path is the recurring cost at scale: encode is
    // map-only — no shuffle anywhere in the serving plan
    val plan = standing.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"standing encode plan shuffles:\n$plan")
  }

  test("encode applies rules in rank order and shrinks the token stream") {
    val corpus = Seq("banana bandana banana", "ban bananas")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val merges = Bpe.learnMerges(df, "text", numMerges = 5)
    val enc = Bpe.encode(df, "text", merges)
      .select(col("id"), col("bpe_tokens")).orderBy("id").collect()
    // every output symbol is a concatenation of input chars; stream is
    // no longer than the character stream and shorter after real merges
    val charLens = corpus.map(_.replace(" ", "").length)
    enc.zipWithIndex.foreach { case (r, i) =>
      val toks = r.getSeq[String](1)
      assert(toks.mkString === corpus(i).replace(" ", ""),
        "concatenated tokens must rebuild the text")
      assert(toks.length < charLens(i), "no compression happened")
    }
    // spot-check greedy left-to-right semantics against the reference
    val ref = referenceMerges(corpus, 5).map { case (l, r, _) => (l, r) }
    assert(merges.map(m => (m.left, m.right)) === ref)
  }
}
