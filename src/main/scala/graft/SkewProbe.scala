package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.Skew

/** Skew-join probe (not part of the driver contract): measures what a
  * single hot key does to a shuffle join and how much each mitigation
  * recovers — (a) plain sort-merge with AQE skew-split disabled (the
  * straggler baseline), (b) AQE's runtime skew-split, (c) manual
  * [[Skew.saltedJoin]].
  *
  * The question this answers for 100 TB planning: AQE only splits a
  * skewed partition when the build side of that partition can be
  * replicated cheaply, and it acts AFTER the map stage has already
  * produced one giant partition file. Salting spreads the hot key at
  * SHUFFLE WRITE time, so no reducer ever owns the whole key. The probe
  * plants a key holding ~30% of a multi-million-row fact table —
  * adversarial but realistic for web-crawl domains or null-ish join keys.
  * Results recorded in BASELINE.md.
  *
  * Usage: runMain graft.SkewProbe [factRows]
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val factRows = args.headOption.map(_.toLong).getOrElse(6000000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dimRows = 10000L
    // ~30% of the fact lands on key 7; the rest is uniform over the dim
    val fact = spark.range(factRows)
      .select(
        when(pmod(col("id"), lit(10)) < 3, lit(7L))
          .otherwise(pmod(col("id") * 2654435761L, lit(dimRows))).as("fk"),
        (col("id") % 1000).cast("double").as("v"))
      .localCheckpoint(true)
    // dim deliberately above the broadcast threshold shape: force the
    // shuffle-join path the mitigation argument is about (a broadcast
    // join has no skew problem — that IS one of the mitigations, but the
    // interesting case is when the dim doesn't fit)
    val dim = spark.range(dimRows)
      .select(col("id").as("dk"), concat(lit("grp_"), pmod(col("id"), lit(50))).as("grp"))
      .localCheckpoint(true)

    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.groupBy("grp").agg(sum("v")).count()
      println(f"[skewprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (groups=$n)")
    }

    def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    // broadcast suppressed everywhere: measuring the SHUFFLE join regimes
    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"

    withConf(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      timed("plain SMJ (skew-split off)")(
        fact.join(dim, col("fk") === col("dk")))
    }
    withConf(noBroadcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // default 5x/256MB thresholds never fire at probe scale; align the
      // trigger with the planted skew the way a 100 TB tuning pass would
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
      timed("AQE skew-split")(
        fact.join(dim, col("fk") === col("dk")))
    }
    withConf(noBroadcast) {
      timed("salted join (factor 32)")(
        Skew.saltedJoin(fact, dim, "fk", "dk", saltFactor = 32))
    }

    spark.stop()
  }
}
