package graft.ml

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment tracking + model registry substitute (SURVEY §2 K7/A9).
  *
  * The reference logs params/metrics/models to MLflow and reads runs back
  * as a DataFrame with nested metrics/params/tags columns
  * (`spark.read.format("mlflow-experiment")`, 03-work with ML
  * models.py:170-183). No MLflow on this JVM: a JSON-lines run log gives
  * the same queryable surface — `runs` returns nested `metrics.*` /
  * `params.*` map columns, and stage tags implement the
  * Production/Staging registry contract (03:29-40).
  */
final class RunLog(dir: String) {

  private val logFile = {
    Files.createDirectories(Paths.get(dir))
    Paths.get(dir, "runs.jsonl")
  }

  private var counter = 0

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** NaN/Infinity are not valid JSON number literals — serialize as null
    * (e.g. AUC over a single-class split is NaN).
    */
  private def num(v: Double): String =
    if (java.lang.Double.isFinite(v)) v.toString else "null"

  /** Append one run record. Returns the run id. */
  def log(
      params: Map[String, String],
      metrics: Map[String, Double],
      tags: Map[String, String] = Map.empty
  ): String = synchronized {
    counter += 1
    val runId = f"run_$counter%05d_${System.nanoTime()}%x"
    def obj(m: Map[String, String]) =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
        .mkString("{", ",", "}")
    val metricsJson = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":${num(v)}""" }.mkString("{", ",", "}")
    val line =
      s"""{"run_id":"$runId","params":${obj(params)},"metrics":$metricsJson,"tags":${obj(tags)}}\n"""
    Files.write(logFile, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    runId
  }

  /** Runs as a DataFrame with nested metrics/params/tags (A9 surface). */
  def runs(spark: SparkSession): DataFrame =
    if (!Files.exists(logFile)) spark.emptyDataFrame
    else spark.read.json(logFile.toString)

  /** The run with the best value of a metric (03:187-198). Empty result
    * when the log is empty or no run recorded the metric — `.head` on the
    * aggregate would otherwise throw on an empty log (emptyDataFrame has
    * no `metrics` column to resolve) and NPE when every value is null.
    */
  def bestRun(spark: SparkSession, metric: String): DataFrame = {
    val r = runs(spark)
    val hasMetric = r.schema.fields.find(_.name == "metrics").exists {
      _.dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.contains(metric)
        case _ => false
      }
    }
    if (!hasMetric) return r.limit(0)
    val row = r.agg(max(col(s"metrics.$metric"))).head()
    if (row.isNullAt(0)) r.limit(0)
    else r.where(col(s"metrics.$metric") === row.getDouble(0)).limit(1)
  }
}

/** Stage-tagged model registry over PipelineModel save/load dirs. Each
  * promote bumps a per-(name, stage) version counter stored BESIDE the
  * artifact, so provenance stamps are derived from the registry rather
  * than asserted by callers.
  */
final class ModelRegistry(dir: String) {

  private def stagePath(name: String, stage: String) =
    Paths.get(dir, name, stage)

  private def versionFile(name: String, stage: String) =
    Paths.get(dir, name, s"$stage.version")

  def promote(model: org.apache.spark.ml.util.MLWritable,
      name: String, stage: String): Long = {
    model.asInstanceOf[org.apache.spark.ml.util.MLWritable]
      .write.overwrite().save(stagePath(name, stage).toString)
    val next = currentVersion(name, stage) + 1
    Files.createDirectories(Paths.get(dir, name))
    Files.writeString(versionFile(name, stage), next.toString)
    next
  }

  /** Version of the artifact currently at (name, stage); 0 if none. */
  def currentVersion(name: String, stage: String): Long =
    if (Files.exists(versionFile(name, stage)))
      Files.readString(versionFile(name, stage)).trim.toLong
    else 0L

  def loadDecisionTree(name: String, stage: String)
      : org.apache.spark.ml.classification.DecisionTreeClassificationModel =
    org.apache.spark.ml.classification.DecisionTreeClassificationModel
      .load(stagePath(name, stage).toString)

  def exists(name: String, stage: String): Boolean =
    Files.exists(stagePath(name, stage))
}
