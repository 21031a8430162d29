package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class QualityClassifierSpec extends SparkSpec {

  test("distilled classifier reproduces the Gopher verdict well (AUC) and is deterministic") {
    val a = QualityClassifier.train(spark, sf0001)
    // the weak rules are simple threshold logic over correlated features,
    // so a depth-5 tree should distill them nearly perfectly
    assert(a.trainAuc >= 0.9, s"train AUC ${a.trainAuc} too low to be a distillation")
    val b = QualityClassifier.train(spark, sf0001)
    assert(a.trainAuc === b.trainAuc, "seeded training diverged")
    val docs = Tables(spark, sf0001).documents
    def scores(t: QualityClassifier.Trained) =
      QualityClassifier.score(docs, t)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(a) === scores(b), "seeded scoring diverged")
  }

  test("scores order documents consistently with the weak labels") {
    val trained = QualityClassifier.train(spark, sf0001)
    val docs = Tables(spark, sf0001).documents
    val joined = QualityClassifier.score(docs, trained)
      .join(QualityClassifier.weakLabels(spark, sf0001), Seq("doc_id"))
      .select(avg(when(col("label") === 1.0, col("quality_prob"))).as("pos"),
        avg(when(col("label") === 0.0, col("quality_prob"))).as("neg"))
      .collect().head
    assert(joined.getDouble(0) > joined.getDouble(1),
      s"passing docs should score higher: pos=${joined.getDouble(0)} neg=${joined.getDouble(1)}")
  }

  test("promoted standing model scores identically after save/load, map-only plan") {
    val trained = QualityClassifier.train(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_registry").toString
    val log = new graft.ml.ModelRegistry(dir)
    log.promote(trained.model, "quality_tree", "production")
    val loaded = log.loadDecisionTree("quality_tree", "production")
    val docs = Tables(spark, sf0001).documents
    val direct = QualityClassifier.score(docs, trained)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val standing = QualityClassifier.score(docs, loaded)
    val viaRegistry = standing
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRegistry === direct, "save/load changed scores")
    // the standing path is the recurring cost at scale: featurize +
    // transform only — no shuffle anywhere in the plan
    val plan = standing.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"standing scoring plan shuffles:\n$plan")
  }

  test("single-class weak labels fail loudly instead of emitting null scores") {
    val s = spark
    import s.implicits._
    // every doc fails Gopher's 50-word minimum → labels are all 0.0; a
    // tree trained on that has a length-1 probability vector and score()
    // would silently return NULL for every document
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_degenerate").toString
    (0L until 20L).map(i => (i, s"short doc $i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(spark, dir)
    }
    assert(e.getMessage.contains("single-class"), e.getMessage)
  }
}
