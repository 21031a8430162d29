package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonlIngestSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit

  test("quarantine splits exactly: parse failures and schema violations out, rest in") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    writeLines(dir, "landing.jsonl", Seq(
      """{"id": 1, "text": "ok one", "lang": "en"}""",
      """{"id": 2, "text": "ok two", "lang": "de"}""",
      """{"id": "NaN", "text": "bad id type", "lang": "en"}""",
      """garbage line""",
      """{"id": 5, "text": "truncated""",
      """{"id": 6, "text": "ok three", "lang": "fr"}"""))
    val (good, bad) = JsonlIngest.readWithQuarantine(spark, dir, schema)
    assert(good.orderBy("id").as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "ok one", "en"), (2L, "ok two", "de"), (6L, "ok three", "fr")))
    val badLines = bad.select("raw_line").as[String].collect().toSet
    assert(badLines === Set(
      """{"id": "NaN", "text": "bad id type", "lang": "en"}""",
      "garbage line",
      """{"id": 5, "text": "truncated"""))
    // the quarantine records WHERE the line came from, for replay
    assert(bad.select("source_file").as[String].collect()
      .forall(_.endsWith("landing.jsonl")))
  }

  test("missing fields are nulls (valid JSON, no quarantine); extra fields ignored") {
    val dir = Files.createTempDirectory("graft_jsonl2").toString
    writeLines(dir, "l.jsonl", Seq(
      """{"id": 1, "text": "no lang"}""",
      """{"id": 2, "text": "extra", "lang": "en", "bonus": 42}"""))
    val (good, bad) = JsonlIngest.readWithQuarantine(spark, dir, schema)
    assert(bad.count() === 0L)
    val rows = good.orderBy("id").collect()
    assert(rows.length === 2 && rows(0).isNullAt(2) && rows(1).getString(2) === "en")
  }

  test("round-trip is byte-exact through JSON escaping (newlines, quotes, unicode)") {
    val dir = Files.createTempDirectory("graft_jsonl3").toString
    val src = Seq(
      (1L, "line one\nline two", "en"),
      (2L, "a \"quoted\" value \t tab", "de"),
      (3L, "unicode: éü中文", "fr"))
      .toDF("id", "text", "lang")
    JsonlIngest.write(src, s"$dir/out", SaveMode.Overwrite)
    val (good, bad) = JsonlIngest.readWithQuarantine(spark, s"$dir/out", schema)
    assert(bad.count() === 0L)
    assert(good.orderBy("id").as[(Long, String, String)].collect().toSeq ===
      src.orderBy("id").as[(Long, String, String)].collect().toSeq)
  }

  test("ingestToLake lands both legs as lake tables with commits") {
    val dir = Files.createTempDirectory("graft_jsonl4").toString
    writeLines(dir, "l.jsonl", Seq(
      """{"id": 1, "text": "ok", "lang": "en"}""",
      """broken"""))
    val (lake, quarantine) = JsonlIngest.ingestToLake(
      spark, dir, s"$dir/lake", s"$dir/quarantine", schema)
    assert(lake.read.count() === 1L)
    assert(quarantine.read.select("raw_line").as[String].collect().toSeq ===
      Seq("broken"))
    assert(lake.history.count() >= 1L && quarantine.history.count() >= 1L)
  }

  test("streaming quarantine splits like batch, and picks up late-landing files") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_jsonl_s").toString
    writeLines(dir, "first.jsonl", Seq(
      """{"id": 1, "text": "ok", "lang": "en"}""",
      """broken one"""))
    val (good, bad) = JsonlIngest.readStreamWithQuarantine(spark, dir, schema)
    val qg = good.writeStream.format("memory").queryName("jsonl_good")
      .trigger(Trigger.AvailableNow()).start()
    val qb = bad.writeStream.format("memory").queryName("jsonl_bad")
      .trigger(Trigger.AvailableNow()).start()
    qg.awaitTermination(60000); qb.awaitTermination(60000)
    assert(spark.table("jsonl_good").as[(Long, String, String)]
      .collect().toSeq === Seq((1L, "ok", "en")))
    assert(spark.table("jsonl_bad").select("raw_line").as[String]
      .collect().toSeq === Seq("broken one"))
    // a file landing later is a new micro-batch, same split
    writeLines(dir, "second.jsonl", Seq(
      """{"id": 2, "text": "late", "lang": "de"}""",
      """also broken"""))
    val qg2 = good.writeStream.format("memory").queryName("jsonl_good2")
      .trigger(Trigger.AvailableNow()).start()
    val qb2 = bad.writeStream.format("memory").queryName("jsonl_bad2")
      .trigger(Trigger.AvailableNow()).start()
    qg2.awaitTermination(60000); qb2.awaitTermination(60000)
    assert(spark.table("jsonl_good2").count() === 2L)
    assert(spark.table("jsonl_bad2").count() === 2L)
  }

  test("streamToLake: continuous ingest lands both legs as committed lake tables") {
    val dir = Files.createTempDirectory("graft_jsonl_sl").toString
    writeLines(dir, "in.jsonl", Seq(
      """{"id": 1, "text": "ok", "lang": "en"}""",
      """{"id": 2, "text": "also ok", "lang": "de"}""",
      """nope"""))
    val (qg, qb) = JsonlIngest.streamToLake(
      spark, dir, s"$dir/lake", s"$dir/quarantine", schema, s"$dir/cp")
    qg.awaitTermination(120000); qb.awaitTermination(120000)
    val lake = LakeTable(spark, s"$dir/lake")
    val quarantine = LakeTable(spark, s"$dir/quarantine")
    assert(lake.read.select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(quarantine.read.select("raw_line").as[String].collect().toSeq === Seq("nope"))
    // every applied batch left a tagged commit (LakeSink idempotence)
    assert(lake.history.count() >= 1L && quarantine.history.count() >= 1L)
    // a late file + a RE-RUN under the same checkpoint + DEFAULT appId:
    // the durable checkpoint continues the batch-id lineage, so the new
    // file lands as a new batch into the SAME table instead of being
    // swallowed by the previous run's high-water mark (the bug a fresh
    // temp checkpoint per run would reintroduce)
    writeLines(dir, "late.jsonl", Seq("""{"id": 3, "text": "late", "lang": "fr"}"""))
    val (qg2, qb2) = JsonlIngest.streamToLake(
      spark, dir, s"$dir/lake", s"$dir/quarantine", schema, s"$dir/cp")
    qg2.awaitTermination(120000); qb2.awaitTermination(120000)
    assert(lake.read.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("both legs stay map-only: no shuffle before the caller aggregates") {
    val dir = Files.createTempDirectory("graft_jsonl5").toString
    writeLines(dir, "l.jsonl", Seq("""{"id": 1, "text": "t", "lang": "en"}"""))
    val (good, bad) = JsonlIngest.readWithQuarantine(spark, dir, schema)
    Seq(good, bad).foreach { leg =>
      leg.collect()
      val plan = leg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
    }
  }
}
