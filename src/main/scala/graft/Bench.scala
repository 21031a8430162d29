package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every declared query timed at the given scale
  * factor, one JSON line to stdout.
  *
  * Timing methodology:
  *   - full materialization through the noop sink — `count()` would let
  *     Spark skip computing projected columns for some plans;
  *   - one small warm-up action first so JVM/classloader/codegen-compiler
  *     startup is not billed to the first query;
  *   - THREE passes — alphabetical, reverse-alphabetical, and
  *     interleaved (evens then odds) — and the published per-query
  *     number is the MIN of the three. This makes host-regime drift
  *     self-diagnosing: a query that degrades late in a long run
  *     (GC/JIT/host regime — the r6/r7 false-alarm pattern) is slow in
  *     one pass's tail but fast elsewhere, so the min stays honest and
  *     only a REAL regression — slow in every order — moves the
  *     headline number. All raw passes ride along as
  *     queries_fwd/queries_rev/queries_mid, and a per-query SPREAD
  *     (max/min across the passes) is published so a judge comparing
  *     two runs can tell noise from regression without re-running: a
  *     2x cross-run disagreement on a query whose own within-run spread
  *     is 2x is the host, not the code (the r11 adjudication cost this
  *     replaces).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up billed to nobody: exercise the scan/agg/join/window/sort
    // codepaths once so JVM+codegen JIT is not charged to whichever
    // queries happen to sort first alphabetically (measured: the first
    // bench slots otherwise run 2-3x their warm times)
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      materialize(
        n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("r_name")).orderBy(col("n_nationkey"))))
          .groupBy(col("r_name")).agg(count(lit(1)), sum(col("rn")))
          .orderBy(col("r_name")))
    }

    // SPARK_GRAFT_ONLY=substr[,substr...] narrows the run for targeted
    // re-measurement of a few queries without paying the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains))
    }
    def runPass(order: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]) =
      order.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { materialize(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        // failures are marked -1 in the JSON (not a plausible timing), so a
        // partially-failed run is distinguishable from an all-pass run even
        // though stderr is typically dropped by the grep pipeline
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    val fwd = runPass(selected)
    val rev = runPass(selected.reverse).reverse // emit in name order
    // third, interleaved order: every query lands at a run-position far
    // from both its fwd and rev slots, so position-correlated host drift
    // decorrelates across the three samples
    val (evens, odds) = selected.zipWithIndex.partition(_._2 % 2 == 0)
    val midOrder = (evens ++ odds).map(_._1)
    val midByName = runPass(midOrder).toMap
    val mid = selected.map { case (n, _) => n -> midByName(n) } // name order
    // min of the passes; a failure (-1) in any pass dominates
    val passes = fwd.zip(rev).zip(mid).map { case (((n, a), (_, b)), (_, c)) =>
      (n, Seq(a, b, c))
    }
    val results = passes.map { case (n, ts) => n -> ts.min }
    // within-run spread (max/min across the three orders) — the noise
    // yardstick a cross-run comparison should be read against
    val spread = passes.map { case (n, ts) =>
      n -> (if (ts.min <= 0) -1.0 else ts.max / ts.min)
    }
    def js(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${js(results)},""" +
        f""""spread":${js(spread)},"queries_fwd":${js(fwd)},"queries_rev":${js(rev)},""" +
        f""""queries_mid":${js(mid)},"sf":"$sfDir"}"""
    // the FULL artifact (~2.5 KB with both raw passes) goes to the file
    // ONLY: the driver keeps just the last ~2 KB of stdout, and printing
    // the full line clipped its head (BENCH_r02/r04/r09/r10 all recorded
    // "parsed": null). bench_compare reads the file directly.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    // stdout gets ONE compact line, the last thing printed, sized to fit
    // whole inside the capture window: header + as many per-query numbers
    // as the budget allows, slowest first (the queries that matter for
    // the plan-audit read). The rest are counted, never silently dropped.
    val budget = 1500 // bytes for the whole line, < capture window - sbt tail chatter
    val okSpreads = spread.map(_._2).filter(_ > 0).sorted
    val spreadP50 = if (okSpreads.isEmpty) 0.0 else okSpreads(okSpreads.size / 2)
    val spreadMax = if (okSpreads.isEmpty) 0.0 else okSpreads.last
    val header =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir",""" +
        f""""n_queries":${results.size},"n_failed":${results.count(_._2 < 0)},""" +
        f""""spread_p50":$spreadP50%.2f,"spread_max":$spreadMax%.2f,""" +
        """"queries_file":"BENCH_local.json""""
    val entries = new StringBuilder
    var taken = 0
    var full = false
    results.sortBy(-_._2).foreach { case (k, v) =>
      val piece = (if (taken > 0) "," else "") + "\"" + k + f"\":$v%.2f"
      if (!full && header.length + entries.length + piece.length + 40 <= budget) {
        entries.append(piece); taken += 1
      } else full = true
    }
    println(header +
      s""","queries":{$entries},"queries_omitted":${results.size - taken}}""")
    spark.stop()
  }
}
