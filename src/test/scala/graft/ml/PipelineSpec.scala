package graft.ml

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Cohort
import graft.features.Featurizer
import graft.ingest.EtlJob

/** End-to-end reference pipeline over the EHR fixtures: ETL (00) ->
  * dashboard analytics (01) -> featurize + train (02) -> registry/score
  * (03). Floating/stochastic outputs are bounds-checked, not hash-matched
  * (SURVEY §5.2).
  */
class PipelineSpec extends SparkSpec {

  private val csvDir = getClass.getResource("/ehr").getPath
  private lazy val lakeDir = Files.createTempDirectory("graft_ehr_lake").toString
  private lazy val etl = EtlJob.run(spark, csvDir, lakeDir, "rwd_test")

  test("ETL: PII hashed, star join registered, catalog queryable") {
    val pe0 = etl.patientEncounters // force the lazy pipeline first
    val pats = spark.table("rwd_test.patients")
    // every PII value is a 40-hex sha1 (incl. NULL -> sha1("null"))
    val row = pats.select("SSN", "FIRST", "SUFFIX").head
    (0 until 3).foreach(i => assert(row.getString(i).matches("[0-9a-f]{40}")))
    val pe = etl.patientEncounters
    assert(pe.count() === 132)
    assert(pe.columns.contains("Org_Name") && pe.columns.contains("MARITAL"))
    // catalog SQL over the registered star (reference 00:204)
    val viaSql = spark.sql(
      "SELECT count(*) FROM rwd_test.patient_encounters WHERE REASONDESCRIPTION IS NOT NULL")
    assert(viaSql.head.getLong(0) > 0)
  }

  test("dashboard: top conditions + comorbid conditions behave like the reference") {
    val pe = etl.patientEncounters
    val top = Cohort.topCategories(pe, "REASONDESCRIPTION", 5).collect()
    assert(top.nonEmpty && top.length <= 5)
    // counts descending
    val counts = top.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // planted comorbidity: among diabetes patients, hypertension co-occurs
    val co = Cohort.coOccurring(pe, "PATIENT", "REASONDESCRIPTION", "diabetes", 5)
      .collect().map(_.getString(0))
    assert(co.contains("Hypertension"), s"got ${co.toSeq}")
  }

  test("chi-square over the EHR contingency is finite and nonnegative") {
    val pe = etl.patientEncounters
    val r = Cohort.chiSquare(pe, col("GENDER"), col("REASONDESCRIPTION").isNotNull).head
    assert(r.getDouble(0) >= 0.0)
    assert(r.getLong(1) === 1L)
    // p-value consistent with the statistic at dof=1
    val p = r.getDouble(2)
    assert(p >= 0.0 && p <= 1.0)
    assert(math.abs(p - graft.functions.Stats.chiSqSurvival(r.getDouble(0), 1.0)) < 1e-6)
  }

  test("featurize -> seeded search -> registry -> score round-trip") {
    val pe = etl.patientEncounters
    val comorbidities = Seq("diabetes", "hypertension", "asthma")
    val feats = Featurizer.encounterFeatures(pe, comorbidities, windowDays = 90)
    // window-feature invariants (SURVEY §5.2): nonneg, frame excludes today
    val bad = feats.where(col("recent_0") < 0 ||
      col("recent_encounters") < 0).count()
    assert(bad === 0)
    val fz = Featurizer.assemble(
      feats,
      categoricalCols = Seq("MARITAL", "RACE", "GENDER"),
      numericCols = Seq("recent_0", "recent_1", "recent_2",
        "recent_encounters", "age", "ZIP"))
    // seeded split (J3) — deterministic
    val Array(train, test) = fz.data.randomSplit(Array(0.7, 0.3), seed = 42L)
    val runDir = Files.createTempDirectory("graft_runs").toString
    val runLog = new RunLog(runDir)
    val result = Trainer.search(train, test, evals = 5, seed = 42L,
      runLog = Some(runLog))
    assert(result.evals.length === 5)
    assert(result.best.auc >= 0.5 && result.best.auc <= 1.0,
      s"AUC ${result.best.auc}")
    // run log queryable with nested metrics (A9)
    val runs = runLog.runs(spark)
    assert(runs.count() === 5)
    // ... and through the DataSourceV2 table (A9 stretch)
    val v2 = spark.read.format("graft.ml.runsource").load(runDir)
    assert(v2.count() === 5)
    val bestV2 = v2.agg(max(col("metrics.area_under_ROC"))).head.getDouble(0)
    assert(bestV2 >= 0.5 && bestV2 <= 1.0)
    assert(v2.select(col("params")("impurity")).collect()
      .forall(r => Set("gini", "entropy").contains(r.getString(0))))
    val best = runLog.bestRun(spark, "area_under_ROC").head
    assert(best.schema.fieldNames.contains("params"))
    // registry promote + load + score (K5, 03:108-140)
    val reg = new ModelRegistry(Files.createTempDirectory("graft_registry").toString)
    reg.promote(result.model, "comorbidity_dt", "Production")
    assert(reg.exists("comorbidity_dt", "Production"))
    val loaded = reg.loadDecisionTree("comorbidity_dt", "Production")
    val scored = loaded.transform(fz.data)
    assert(scored.columns.contains("prediction"))
    // scorer facade: provenance stamping + breakdown (03:110-152); the
    // version comes from the registry's promote counter, not the caller
    assert(reg.currentVersion("comorbidity_dt", "Production") === 1L)
    val stamped = Scorer.scoreWithMetadata(
      reg, Scorer.ModelRef("comorbidity_dt", "Production"), fz.data)
    val head = stamped.select("model_name", "model_stage", "scored_at", "model_version").head
    assert(head.getString(0) === "comorbidity_dt")
    assert(head.getString(1) === "Production")
    assert(!head.isNullAt(2)) // current_timestamp stamped
    assert(head.getLong(3) === 1L)
    // re-promoting bumps the registry version
    reg.promote(result.model, "comorbidity_dt", "Production")
    assert(reg.currentVersion("comorbidity_dt", "Production") === 2L)
    val breakdown = Scorer.predictionBreakdown(
      stamped, Seq("MARITAL", "RACE", "GENDER"))
    assert(breakdown.columns.toSeq ===
      Seq("MARITAL", "RACE", "GENDER", "prediction", "count"))
    assert(breakdown.count() >= 0)
  }

  test("bestRun on an empty or metric-less log returns empty, not an exception") {
    val emptyLog = new RunLog(Files.createTempDirectory("graft_runs_empty").toString)
    assert(emptyLog.bestRun(spark, "area_under_ROC").isEmpty)
    emptyLog.log(Map("p" -> "1"), Map("other_metric" -> 0.5))
    assert(emptyLog.bestRun(spark, "area_under_ROC").isEmpty)
    assert(emptyLog.bestRun(spark, "other_metric").count() === 1)
  }

  test("adaptive search is at least as good as the random baseline, same budget+seed") {
    val pe = etl.patientEncounters
    val feats = Featurizer.encounterFeatures(pe, Seq("diabetes"), 90)
    val fz = Featurizer.assemble(feats, Seq("GENDER"), Seq("recent_encounters", "age"))
    val Array(tr, te) = fz.data.randomSplit(Array(0.7, 0.3), seed = 42L)
    val adaptive = Trainer.search(tr, te, evals = 8, seed = 11L)
    val random = Trainer.searchRandom(tr, te, evals = 8, seed = 11L)
    assert(adaptive.evals.length === 8 && random.evals.length === 8)
    assert(adaptive.best.auc >= random.best.auc,
      s"adaptive ${adaptive.best.auc} < random ${random.best.auc}")
    // the exploit tail actually concentrates: at least one late eval is a
    // local move (distance 1 in one dimension) from an earlier incumbent
    val late = adaptive.evals.drop(4).map(_.params)
    val early = adaptive.evals.map(_.params)
    // a local move differs from its incumbent in EXACTLY one dimension
    // (an XOR of the three flags would also accept all-three-differ, i.e.
    // a fresh uniform draw)
    def near(a: Trainer.Params, b: Trainer.Params): Boolean =
      Seq(a.maxDepth != b.maxDepth, a.maxBins != b.maxBins,
        a.impurity != b.impurity).count(identity) == 1
    assert(late.exists(l => early.exists(e => near(l, e))),
      s"no local move found in exploit tail: $late")
  }

  test("parallel adaptive search: generations exploit, quality matches sequential, deterministic") {
    val pe = etl.patientEncounters
    val feats = Featurizer.encounterFeatures(pe, Seq("diabetes"), 90)
    val fz = Featurizer.assemble(feats, Seq("GENDER"), Seq("recent_encounters", "age"))
    val Array(tr, te) = fz.data.randomSplit(Array(0.7, 0.3), seed = 42L)
    val seq = Trainer.search(tr, te, evals = 8, seed = 11L)
    val par = Trainer.searchAdaptiveParallel(tr, te, evals = 8, seed = 11L,
      parallelism = 4)
    assert(par.evals.length === 8)
    // batching the exploit generations must not cost quality on the
    // seeded fixture
    assert(par.best.auc >= seq.best.auc,
      s"parallel adaptive ${par.best.auc} < sequential ${seq.best.auc}")
    // the exploit generations actually concentrate: a late eval is a
    // local move (exactly one dimension changed) from an earlier point
    def near(a: Trainer.Params, b: Trainer.Params): Boolean =
      Seq(a.maxDepth != b.maxDepth, a.maxBins != b.maxBins,
        a.impurity != b.impurity).count(identity) == 1
    val late = par.evals.drop(4).map(_.params)
    val early = par.evals.map(_.params)
    assert(late.exists(l => early.exists(e => near(l, e))),
      s"no local move found in exploit generations: $late")
    // deterministic across runs despite thread scheduling (same
    // parallelism: the generation size shapes the proposal stream, so
    // only equal-parallelism runs are bit-identical)
    val again = Trainer.searchAdaptiveParallel(tr, te, evals = 8, seed = 11L,
      parallelism = 4)
    assert(again.evals.map(_.params) === par.evals.map(_.params))
    assert(again.best.auc === par.best.auc)
  }

  test("parallel trials reproduce the sequential search exactly, faster") {
    val pe = etl.patientEncounters
    val feats = Featurizer.encounterFeatures(pe, Seq("diabetes"), 90)
    val fz = Featurizer.assemble(feats, Seq("GENDER"), Seq("recent_encounters", "age"))
    val Array(tr, te) = fz.data.randomSplit(Array(0.7, 0.3), seed = 42L)
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (seq, seqSec) = timed(Trainer.searchRandom(tr, te, evals = 8, seed = 11L))
    val (par, parSec) = timed(Trainer.searchParallel(tr, te, evals = 8, seed = 11L,
      parallelism = 4))
    // identical proposal stream, identical per-trial results, identical
    // winner — completion order must not leak into ANY of it
    assert(par.evals.map(_.params) === seq.evals.map(_.params),
      "parallel proposals diverged from the seeded sequential stream")
    assert(par.evals.map(_.auc) === seq.evals.map(_.auc),
      "per-trial AUCs differ between parallel and sequential evaluation")
    assert(par.best.params === seq.best.params)
    assert(par.best.auc === seq.best.auc)
    // determinism across parallel runs (thread scheduling varies)
    val again = Trainer.searchParallel(tr, te, evals = 8, seed = 11L, parallelism = 3)
    assert(again.best.params === par.best.params)
    assert(again.evals.map(_.auc) === par.evals.map(_.auc))
    // wall-time note for the record (4 threads on local[4]; not asserted
    // strictly — tiny fits have fixed scheduling overhead)
    info(f"sequential $seqSec%.1fs vs parallel $parSec%.1fs (x${seqSec / parSec}%.2f)")
  }

  test("search is deterministic given the seed") {
    val pe = etl.patientEncounters
    val feats = Featurizer.encounterFeatures(pe, Seq("diabetes"), 90)
    val fz = Featurizer.assemble(feats, Seq("GENDER"), Seq("recent_encounters", "age"))
    val Array(tr, te) = fz.data.randomSplit(Array(0.7, 0.3), seed = 42L)
    val a = Trainer.search(tr, te, evals = 3, seed = 7L)
    val b = Trainer.search(tr, te, evals = 3, seed = 7L)
    assert(a.best.params === b.best.params)
    assert(a.best.auc === b.best.auc)
    assert(a.evals.map(_.params) === b.evals.map(_.params))
  }
}
