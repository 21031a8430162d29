package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** Automatic stats-based file skipping for lake-table scans — the
  * optimizer-rule twin of `LakeTable.readWhere`.
  *
  * `readWhere` gives API callers data skipping, but a SQL user querying a
  * registered lake NAME (`SELECT … FROM rwd.t WHERE k = 5`), the
  * `graft_lake` TVF, or even a bare `spark.read.parquet(lakeDir)` plans a
  * scan over EVERY data file: parquet row-group min/max still applies
  * inside each file, but all files are opened. This rule closes that gap
  * the way Delta's PrepareDeltaScan does — during optimization, a Filter
  * directly over a parquet relation rooted at a lake table directory has
  * its file index replaced with the stats-pruned subset:
  *
  *   - correctness is inherited from `prunedFilesResolved`: stats only
  *     SHRINK the file list (files without a stats row are always kept,
  *     unknown predicate shapes prune nothing), and the row-level Filter
  *     stays in the plan, so the result is byte-identical to the unpruned
  *     scan;
  *   - the rule is injected as a PRE-CBO rule (a run-Once batch), not
  *     into the operator-optimization fixpoint: pruning consults the
  *     stats table with a real (tiny) Spark job, which must run once per
  *     query, not once per fixpoint iteration. Predicate pushdown has
  *     already run by then, so the Filter sits directly on the relation;
  *   - the replaced index is marked ([[GraftPrunedFileIndex]]) so a
  *     nested re-entry (the stats read itself passes through the
  *     optimizer) or a second rule application leaves it alone;
  *   - Hive-partitioned lake layouts are skipped: planning-time partition
  *     pruning already covers them, and mixing the two would drop the
  *     partition-column derivation from the swapped index;
  *   - shallow clones are skipped (their data files live in the source
  *     table — stats would claim files the manifest resolves elsewhere);
  *   - any failure (stats schema drift, FS hiccup) falls back to the
  *     unpruned plan: wrong answers are impossible, only missed skipping.
  *
  * At 100 TB this is the difference between "data skipping if you call
  * the right API" and "data skipping because you wrote WHERE" — the
  * latter is what the reference's dashboard users (01-rwe-dashboard.r:33)
  * actually do.
  */
case class LakeSkippingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, rel: LogicalRelation) =>
      pruned(cond, rel).map(r => Filter(cond, r)).getOrElse(f)
  }

  private def pruned(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rel: LogicalRelation): Option[LogicalRelation] = rel.relation match {
    case hfs: HadoopFsRelation
        if !hfs.location.isInstanceOf[GraftPrunedFileIndex] &&
          hfs.partitionSchema.isEmpty &&
          hfs.location.rootPaths.length == 1 &&
          hfs.fileFormat.toString.toLowerCase(java.util.Locale.ROOT).contains("parquet") =>
      try {
        val root = hfs.location.rootPaths.head
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(new Path(root, graft.sources.LakeTable.LogDirName)) ||
            !fs.exists(new Path(root, graft.sources.LakeTable.StatsDirName)))
          return None
        val lake = graft.sources.LakeTable(spark, root.toString)
        if (lake.isShallowClone) return None
        val before = hfs.location.inputFiles.length
        val surviving = lake.prunedFilesResolved(cond)
        if (surviving.length >= before) return None // nothing pruned: keep plan
        val idx = new GraftPrunedFileIndex(
          spark, surviving.map(new Path(_)), Map("basePath" -> root.toString))
        Some(rel.copy(relation = hfs.copy(location = idx)(spark)))
      } catch {
        case scala.util.control.NonFatal(e) =>
          logWarning(s"lake file skipping skipped (falling back to full scan): $e")
          None
      }
    case _ => None
  }
}

/** Marker subclass: an index this rule already produced (also the probe
  * handle tests use to assert the rule fired).
  */
class GraftPrunedFileIndex(
    spark: SparkSession,
    files: Seq[Path],
    parameters: Map[String, String])
  extends InMemoryFileIndex(spark, files, parameters, userSpecifiedSchema = None)
