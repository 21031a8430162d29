package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class TrainingDataSpec extends SparkSpec {

  test("pipeline stages only ever shrink the corpus, deterministically") {
    val docs = Tables(spark, sf0001).documents
    val cfg = TrainingData.Config()
    val out1 = TrainingData.prepare(docs, cfg).collect().map(_.toSeq)
    val out2 = TrainingData.prepare(docs, cfg).collect().map(_.toSeq)
    assert(out1.toSeq === out2.toSeq)
    assert(out1.length <= docs.where(col("lang") === "en").count())
    assert(out1.nonEmpty)
  }

  test("near-dup stage removes the higher id of each planted pair") {
    val docs = Tables(spark, sf0001).documents
    val survivors = TrainingData.prepare(docs, TrainingData.Config(lang = None))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!survivors.contains(b) || !survivors.contains(a),
        s"near-dup pair ($a,$b) both survived")
    }
  }

  test("quality column is within [0,1] and the gate holds") {
    val out = TrainingData.prepare(
      Tables(spark, sf0001).documents, TrainingData.Config(minQuality = 0.5))
    out.select("quality").collect().foreach { r =>
      assert(r.getDouble(0) >= 0.5 && r.getDouble(0) <= 1.0)
    }
  }

  test("leakage-safe split: no near-dup pair straddles train/test; covers all docs") {
    val docs = Tables(spark, sf0001).documents
    val split = TrainingData.leakageSafeSplit(docs, testFrac = 0.3)
    val byDoc = split.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byDoc.size === docs.count()) // every doc assigned exactly once
    val sides = byDoc.values.toSet
    assert(sides === Set("train", "test")) // both sides populated at 30%
    // THE invariant: near-duplicates (and their transitive closure —
    // same component implies same side by construction, so checking
    // direct pairs suffices for the generation used) never straddle
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) === byDoc(b), s"near-dup pair ($a,$b) split apart")
    }
    // deterministic across reruns
    val again = TrainingData.leakageSafeSplit(docs, testFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again === byDoc)
  }
}
