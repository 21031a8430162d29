package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.sources.JsonlIngest

/** JSONL-ingest probe (not part of the driver contract): what does the
  * quarantine split cost over the cheapest possible ingest, and does
  * that cost stay a constant factor as the corpus grows?
  *
  * Three readers over the same landing files (documents replicated N×
  * as JSONL, 0.5% corrupt lines interleaved):
  *   (a) raw line count — the floor: one text scan, no parse;
  *   (b) DROPMALFORMED — one parse, bad lines silently discarded;
  *   (c) readWithQuarantine, BOTH legs — the production path: good
  *       rows aggregated AND bad lines counted.
  * The quarantine leg re-scans the text source (two queries over one
  * source), so the honest expectation is (c) ≈ 2×(b) wall-clock on a
  * cold source, NOT parse-count explosion — the split predicate itself
  * is a stateless filter. At 100 TB the second scan is the price of
  * dropped-line observability; a combined single-pass sink (foreachBatch
  * writing both legs) halves it back when that matters. Results in
  * BASELINE.md.
  *
  * Usage: runMain graft.IngestProbe [replication]
  */
object IngestProbe {

  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    val schema = docs.schema
    val dir = java.nio.file.Files.createTempDirectory("graft_ingestprobe").toString

    // landing corpus: rep replicas with distinct ids; every 200th line
    // replaced by a corrupt one (unterminated JSON), interleaved in the
    // same files so the split predicate runs everywhere
    val replicated = spark.range(rep).crossJoin(docs)
      .select(
        (col("doc_id") + col("id") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val asJson = replicated
      .select(when(pmod(col("doc_id"), lit(200)) === 0,
          lit("""{"doc_id": 1, "text": "trunc"""))
        .otherwise(to_json(struct(
          col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))))
        .as("value"))
    asJson.write.mode(SaveMode.Overwrite).text(dir)
    val nLines = spark.read.textFile(dir).count()
    println(s"[ingestprobe] corpus: $nLines lines, rep=$rep")

    def timed(label: String)(body: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (a, b) = body
      println(f"[ingestprobe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f" (good=$a bad=$b)")
    }

    timed("raw line count (floor)") {
      (spark.read.textFile(dir).count(), -1L)
    }
    timed("DROPMALFORMED (silent)") {
      (JsonlIngest.ingestAs(spark, dir, schema)
        .agg(count(lit(1)), sum(col("n_chars"))).head().getLong(0), -1L)
    }
    timed("quarantine split (both legs)") {
      val (good, bad) = JsonlIngest.readWithQuarantine(spark, dir, schema)
      (good.agg(count(lit(1)), sum(col("n_chars"))).head().getLong(0), bad.count())
    }
    spark.stop()
  }
}
