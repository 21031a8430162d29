package graft.ml.runsource

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for graft run logs (SURVEY §2 A9 stretch): the
  * equivalent of the reference's `spark.read.format("mlflow-experiment")`
  * metadata source (03-work with ML models.py:170-172), as a first-class
  * Spark table:
  *
  * {{{
  * spark.read.format("graft.ml.runsource").load(runDir)
  *   .select($"run_id", $"metrics.area_under_ROC")
  * }}}
  *
  * One InputPartition per log file: run logs are metadata-sized (a line
  * per training run), so per-file parallelism is plenty — the point of the
  * V2 implementation is the integration (schema, pushdown-ready scan
  * surface, catalog compatibility), not byte throughput.
  */
class RunsSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RunsSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RunsTable(properties.get("path"))
}

/** Lets callers use `format("graft.ml.runsource")` — Spark's source
  * resolution appends `.DefaultSource` to the format string.
  */
class DefaultSource extends RunsSource

object RunsSource {
  val Schema: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("params", MapType(StringType, StringType), nullable = false),
    StructField("metrics", MapType(StringType, DoubleType), nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false)
  ))
}

final class RunsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_runs($path)"
  override def schema(): StructType = RunsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new RunsScan(path)
}

final class RunsScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = RunsSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    require(path != null, "graft.ml.runsource requires a path: .load(dir)")
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".jsonl")).map(_.getAbsolutePath)
      else if (dir.isFile) Array(path)
      else Array.empty[String] // not-yet-existing log dir -> empty table
    files.sorted.map(f => RunsPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = RunsReaderFactory
}

case class RunsPartition(file: String) extends InputPartition

object RunsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RunsReader(partition.asInstanceOf[RunsPartition].file)
}

final class RunsReader(file: String) extends PartitionReader[InternalRow] {

  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines().filter(_.trim.nonEmpty)
  private val mapper = new ObjectMapper()
  private var current: InternalRow = _

  private def toMapData(node: JsonNode, double: Boolean): ArrayBasedMapData = {
    val fields = node.fields().asScala.toSeq.sortBy(_.getKey)
    val keys = fields.map(e => UTF8String.fromString(e.getKey): Any).toArray
    val values = fields.map { e =>
      if (double) (e.getValue.asDouble(): Any)
      else (UTF8String.fromString(e.getValue.asText()): Any)
    }.toArray
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(values))
  }

  override def next(): Boolean =
    if (!it.hasNext) false
    else {
      val node = mapper.readTree(it.next())
      current = InternalRow(
        UTF8String.fromString(node.get("run_id").asText()),
        toMapData(node.get("params"), double = false),
        toMapData(node.get("metrics"), double = true),
        toMapData(node.get("tags"), double = false))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
