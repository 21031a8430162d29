package graft.plans

import org.apache.spark.sql.{Column, GraftBridge, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.sources.{LakeTable, MergeClause}

/** SQL DML statements over lake tables — the Delta-SQL surface a SQL-first
  * user reaches for (the reference drives its whole ETL through SQL strings,
  * 00-etl-rwd.py:151-204):
  *
  * {{{
  * DELETE FROM graft_lake('/p') WHERE c > 3
  * UPDATE graft_lake('/p') SET v = v + 1, s = 'x' WHERE k = 2
  * INSERT INTO graft_lake('/p') (id, v) VALUES (1, 2.5), (2, 3.5)
  * INSERT OVERWRITE graft_lake('/p') SELECT * FROM src
  * INSERT INTO graft_lake('/p') REPLACE WHERE day = '2024-06-01' SELECT …
  * APPLY CHANGES INTO graft_lake('/p') FROM cdc_src KEYS (id) SEQUENCE BY seq
  * MERGE INTO graft_lake('/p') t USING src s ON t.id = s.id
  *   WHEN MATCHED AND s.del THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET v = s.v
  *   WHEN NOT MATCHED THEN INSERT *
  *   WHEN NOT MATCHED BY SOURCE THEN DELETE
  * ALTER TABLE graft_lake('/p') ADD COLUMNS (score DOUBLE)
  * ALTER TABLE graft_lake('/p') ADD CONSTRAINT pos CHECK (v > 0)
  * ALTER TABLE graft_lake('/p') SET TBLPROPERTIES ('k' = 'v')
  * ALTER TABLE graft_lake('/p') UNSET TBLPROPERTIES ('k')
  * SHOW TBLPROPERTIES graft_lake('/p')
  * COPY INTO graft_lake('/p') FROM '/landing' FILEFORMAT = JSONL
  *   SCHEMA 'id BIGINT, t STRING' WITH QUARANTINE
  * OPTIMIZE graft_lake('/p') ZORDER BY (id, day)
  * OPTIMIZE graft_lake('/p') HILBERT BY (id, day)
  * OPTIMIZE graft_lake('/partitioned') WHERE day = '2024-06-01'
  * VACUUM graft_lake('/versioned') RETAIN 3 VERSIONS
  * VACUUM graft_lake('/versioned') RETAIN 168 HOURS
  * GENERATE symlink_format_manifest FOR TABLE graft_lake('/p')
  * RESTORE graft_lake('/versioned') TO VERSION AS OF 3
  * CREATE TABLE db.t USING graft_lake LOCATION '/p'   -- register a NAME
  * CREATE TABLE db.t3 (id BIGINT, v DOUBLE) USING graft_lake LOCATION '/p3'
  * CREATE TABLE db.t2 SHALLOW CLONE db.t LOCATION '/p2'
  * DROP TABLE db.t                                    -- unregister, keep data
  * }}}
  *
  * Every statement's target may also be a NAME registered by `CREATE
  * TABLE … USING graft_lake` / [[graft.sources.LakeNames.register]]
  * (`DELETE FROM db.t WHERE …`); MERGE takes Delta's `WITH SCHEMA
  * EVOLUTION` modifier.
  *
  * Injected via `SparkSessionExtensions.injectParser`: statements whose
  * target is the `graft_lake('<path>')` table function are translated to
  * the existing [[LakeTable]].delete/update/merge calls (same staged-swap
  * durability, change feed, constraint checks); everything else — including
  * DML against non-lake tables — falls through verbatim to Spark's parser,
  * so native behavior and native errors are untouched.
  *
  * The statement STRUCTURE (keywords, clause boundaries, assignments) is
  * recognized by a small quote/paren-aware tokenizer; every embedded
  * expression and the MERGE source relation are handed back to Spark's own
  * parser, so full expression syntax works inside conditions and SET.
  * MERGE `WHEN NOT MATCHED ... INSERT` supports the whole-row `INSERT *`
  * form (the common Delta idiom); column-list INSERT raises a clear error.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LakeSqlDml.parse(sqlText, delegate)
      .getOrElse(LakeTimeTravel.rewrite(delegate.parsePlan(sqlText), sqlText))
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    LakeTimeTravel.rewrite(delegate.parseQuery(sqlText), sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
}

/** Delta's native time-travel spelling on registered lake names:
  * `SELECT … FROM db.t VERSION AS OF 3` / `TIMESTAMP AS OF <expr>`.
  *
  * Spark parses the suffix into [[RelationTimeTravel]], but its analyzer
  * rejects time travel on v1 session-catalog relations (our names are
  * views) BEFORE injected resolution rules run — so the rewrite happens
  * at parse time instead: a time-traveled relation whose name resolves
  * via [[graft.sources.LakeNames]] becomes the `graft_lake(path, arg)`
  * TVF, which already implements both travel forms. Unregistered names
  * keep Spark's native behavior (and native errors) untouched.
  */
object LakeTimeTravel {
  private val AsOf = java.util.regex.Pattern.compile(
    "\\bAS\\s+OF\\b", java.util.regex.Pattern.CASE_INSENSITIVE)

  def rewrite(plan: LogicalPlan, sqlText: String): LogicalPlan = {
    if (!AsOf.matcher(sqlText).find()) return plan // fast path: no travel syntax
    plan.transformUpWithSubqueries {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        org.apache.spark.sql.SparkSession.getActiveSession
          .flatMap(s => graft.sources.LakeNames.resolve(s, u.multipartIdentifier)) match {
          case Some(path) =>
            val arg: Expression = (ver, ts) match {
              case (Some(v), _) =>
                val n = try v.toLong catch {
                  case _: NumberFormatException => throw new IllegalArgumentException(
                    s"VERSION AS OF on lake table ${u.multipartIdentifier.mkString(".")} " +
                      s"needs an integer version, got `$v`")
                }
                org.apache.spark.sql.catalyst.expressions.Literal(n)
              case (None, Some(e)) => e
              case (None, None)    => return plan // grammar guarantees one; be safe
            }
            UnresolvedTableValuedFunction(
              "graft_lake",
              Seq(org.apache.spark.sql.catalyst.expressions.Literal(path), arg))
          case None => tt
        }
    }
  }
}

/** `DELETE FROM graft_lake(path) [alias] [WHERE cond]` — routed by
  * layout: a versioned table gets a history-preserving new snapshot, a
  * plain table the staged rewrite — or, when the session conf
  * `spark.graft.lake.delete.mode` is `merge-on-read`, a deletion-vector
  * write ([[graft.sources.LakeTable.deleteVectored]]): the point-delete
  * shape on a huge table records matched row positions instead of
  * rewriting files.
  */
final case class LakeDeleteCommand(path: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (graft.sources.VersionedLakeTable.isVersioned(spark, path))
      graft.sources.VersionedLakeTable(spark, path).delete(cond)
    else {
      val mode = spark.conf.get(LakeSqlDml.DeleteModeKey, "copy-on-write")
      if (mode == "merge-on-read") LakeTable(spark, path).deleteVectored(cond)
      else LakeTable(spark, path).delete(cond)
    }
    Seq.empty
  }
}

/** `COPY INTO <lake> FROM '<dir>' [FILEFORMAT = fmt]` — idempotent file
  * ingest via [[graft.sources.LakeTable.copyInto]].
  */
final case class LakeCopyIntoCommand(path: String, source: String, format: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeTable(spark, path).copyInto(source, format)
    Seq.empty
  }
}

/** `SHOW TBLPROPERTIES graft_lake('<path>')` — the read side of the
  * SET/UNSET TBLPROPERTIES surface, (key, value) rows sorted by key.
  */
final case class LakeShowPropertiesCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "key", org.apache.spark.sql.types.StringType, nullable = false)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "value", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    LakeTable(spark, path).tableProperties.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `COPY INTO <lake> FROM '<dir>' FILEFORMAT = JSONL SCHEMA '<ddl>' WITH
  * QUARANTINE` — the quarantine ingest
  * ([[graft.sources.LakeTable.copyIntoJsonlQuarantine]]) reachable from
  * pure SQL, completing the "SQL user reaches everything" contract for
  * the landing-zone path the way the TVFs completed it for serving.
  */
final case class LakeCopyIntoQuarantineCommand(
    path: String, source: String, schemaDdl: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeTable(spark, path).copyIntoJsonlQuarantine(source,
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    Seq.empty
  }
}

/** `UPDATE graft_lake(path) [alias] SET ... [WHERE cond]` — layout-routed
  * like [[LakeDeleteCommand]].
  */
final case class LakeUpdateCommand(path: String, set: Seq[(String, Column)], cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (graft.sources.VersionedLakeTable.isVersioned(spark, path))
      graft.sources.VersionedLakeTable(spark, path).update(set.toMap, cond)
    else LakeTable(spark, path).update(set.toMap, cond)
    Seq.empty
  }
}

/** `OPTIMIZE graft_lake(path) [ZORDER BY (c1, …) | HILBERT BY (c1, …)]`
  * — linear range clustering without a BY clause (Delta's compaction),
  * Morton bit-interleave clustering with ZORDER BY, Hilbert-curve
  * clustering with HILBERT BY ([[graft.sources.LakeTable.optimizeHilbert]]);
  * versioned tables cluster into a new snapshot. `VACUUM graft_lake(path)
  * [RETAIN <n> VERSIONS]` — crash-debris GC on plain tables, snapshot
  * retention on versioned.
  */
final case class LakeMaintenanceCommand(
    path: String,
    op: LakeMaintenanceCommand.Op) extends LeafRunnableCommand {
  // DRY RUN variants RETURN the would-be-dropped versions as rows
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    op match {
      case LakeMaintenanceCommand.Vacuum(_, true) |
           LakeMaintenanceCommand.VacuumHours(_, true) =>
        Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "version", org.apache.spark.sql.types.LongType, nullable = false)())
      // GENERATE returns the written manifest paths (observability;
      // Delta returns nothing, but the caller needs the handoff paths)
      case LakeMaintenanceCommand.GenerateManifest =>
        Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "manifest", org.apache.spark.sql.types.StringType, nullable = false)())
      case _ => Nil
    }
  override def run(spark: SparkSession): Seq[Row] = {
    val versioned = graft.sources.VersionedLakeTable.isVersioned(spark, path)
    op match {
      case LakeMaintenanceCommand.Optimize(Seq(), _) if versioned =>
        throw new IllegalArgumentException(
          "OPTIMIZE on a versioned table needs ZORDER BY columns (its optimize " +
            "clusters by the given keys into a new snapshot)")
      case LakeMaintenanceCommand.Optimize(_, true) if versioned =>
        throw new IllegalArgumentException(
          "HILBERT BY clustering applies to plain lake tables; versioned " +
            "tables cluster snapshots via OPTIMIZE … ZORDER BY")
      case LakeMaintenanceCommand.Optimize(cols, _) if versioned =>
        graft.sources.VersionedLakeTable(spark, path).optimize(cols)
      case LakeMaintenanceCommand.Optimize(Seq(), _) =>
        LakeTable(spark, path).compact()
      case LakeMaintenanceCommand.Optimize(cols, true) =>
        LakeTable(spark, path).optimizeHilbert(cols)
      case LakeMaintenanceCommand.Optimize(cols, false) =>
        LakeTable(spark, path).optimizeZorder(cols)
      case LakeMaintenanceCommand.OptimizeWhere(_) if versioned =>
        throw new IllegalArgumentException(
          "OPTIMIZE … WHERE targets Hive-partitioned plain lake tables; " +
            "versioned tables cluster whole snapshots via OPTIMIZE … ZORDER BY")
      case LakeMaintenanceCommand.OptimizeWhere(cond) =>
        LakeTable(spark, path).optimizeWhere(cond)
      case LakeMaintenanceCommand.Vacuum(None, _) if versioned =>
        throw new IllegalArgumentException(
          "VACUUM on a versioned table needs RETAIN <n> VERSIONS (or HOURS)")
      case LakeMaintenanceCommand.Vacuum(Some(keep), true) if versioned =>
        return graft.sources.VersionedLakeTable(spark, path)
          .vacuumDryRun(keep).map(Row(_))
      case LakeMaintenanceCommand.Vacuum(Some(keep), false) if versioned =>
        graft.sources.VersionedLakeTable(spark, path).vacuum(keep)
      case LakeMaintenanceCommand.VacuumHours(h, true) if versioned =>
        return graft.sources.VersionedLakeTable(spark, path)
          .vacuumRetainHoursDryRun(h).map(Row(_))
      case LakeMaintenanceCommand.VacuumHours(h, false) if versioned =>
        graft.sources.VersionedLakeTable(spark, path).vacuumRetainHours(h)
      case LakeMaintenanceCommand.VacuumHours(_, _) =>
        throw new IllegalArgumentException(
          "RETAIN <n> HOURS applies to versioned tables (whose snapshots " +
            "carry commit timestamps); plain-table VACUUM collects crash " +
            "debris only")
      case LakeMaintenanceCommand.Vacuum(keep, dry) =>
        require(keep.isEmpty && !dry,
          "RETAIN <n> VERSIONS / DRY RUN apply to versioned tables; " +
            "plain-table VACUUM collects crash debris only")
        LakeTable(spark, path).vacuumDebris()
      case LakeMaintenanceCommand.VacuumChanges(_) if versioned =>
        throw new IllegalArgumentException(
          "VACUUM … CHANGES trims a plain lake table's change feed; versioned " +
            "tables retire whole snapshots via VACUUM … RETAIN <n> VERSIONS")
      case LakeMaintenanceCommand.VacuumChanges(keep) =>
        LakeTable(spark, path).vacuumChanges(keep)
      case LakeMaintenanceCommand.GenerateManifest =>
        // versioned layouts generate a HEAD-SNAPSHOT manifest (the
        // current _v{N} dir's files) — same spelling, same reader side
        return LakeTable(spark, path).generateSymlinkManifest().map(Row(_))
    }
    Seq.empty
  }
}

object LakeMaintenanceCommand {
  sealed trait Op
  final case class Optimize(clusterBy: Seq[String], hilbert: Boolean = false) extends Op
  final case class OptimizeWhere(partitionCond: org.apache.spark.sql.Column) extends Op
  final case class Vacuum(retainVersions: Option[Int], dryRun: Boolean = false) extends Op
  final case class VacuumHours(retainHours: Double, dryRun: Boolean = false) extends Op
  final case class VacuumChanges(retainVersions: Int) extends Op
  case object GenerateManifest extends Op
}

/** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] db.t USING graft_lake
  * LOCATION '<path>'` — the reference's named-table registration idiom
  * (`CREATE TABLE rwd_hls.patient_encounters … LOCATION`,
  * /root/reference/00-etl-rwd.py:158-200) routed to
  * [[graft.sources.LakeNames.register]]. The location must already hold
  * a lake table (the registration view analyzes it); a single-part name
  * registers into the current database.
  */
final case class LakeCreateNamedCommand(
    nameParts: Seq[String], path: String,
    orReplace: Boolean, ifNotExists: Boolean,
    ctasSql: Option[String] = None,
    partitionBy: Seq[String] = Seq.empty,
    schemaDdl: Option[String] = None) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (db, table) = nameParts match {
      case Seq(t)    => (spark.catalog.currentDatabase, t)
      case Seq(d, t) => (d, t)
      case _ => throw new IllegalArgumentException(
        "CREATE TABLE … USING graft_lake expects `table` or `db.table`, got " +
          nameParts.mkString("."))
    }
    val exists = spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
    if (exists && ifNotExists) return Seq.empty
    require(orReplace || !exists,
      s"table $db.$table already exists (use OR REPLACE or IF NOT EXISTS)")
    ctasSql.foreach { q =>
      val lake = LakeTable(spark, path)
      // Delta refuses CTAS into a location that already holds a table
      // unless the statement says REPLACE — same contract here.
      require(orReplace || !lake.exists,
        s"location $path already holds data (use CREATE OR REPLACE to rewrite it)")
      val df = spark.sql(q)
      if (partitionBy.nonEmpty)
        lake.writePartitioned(df, partitionBy, SaveMode.Overwrite,
          overwriteSchema = true)
      else lake.write(df, SaveMode.Overwrite, overwriteSchema = true)
    }
    // schema-first creation (Delta's empty-table CREATE): a fresh
    // location gets an EMPTY table carrying exactly the declared schema;
    // registering over existing data requires the declared schema to
    // match the stored one — a silent mismatch would poison every read.
    schemaDdl.foreach { ddl =>
      val schema = spark.sessionState.sqlParser.parseTableSchema(ddl)
      val lake = LakeTable(spark, path)
      if (lake.exists && !orReplace) {
        def shape(s: org.apache.spark.sql.types.StructType) =
          s.fields.toSeq.map(f =>
            (f.name.toLowerCase(java.util.Locale.ROOT), f.dataType))
        require(shape(lake.read.schema) == shape(schema),
          s"declared columns (${schema.map(_.name).mkString(", ")}) do not " +
            s"match the existing table at $path — drop the column list to " +
            "register as-is, or declare the stored schema")
      } else {
        // one empty partition, not zero: the single footer-only parquet
        // file is what lets schema inference (and the registration view)
        // see the declared schema before any data arrives
        val empty = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq.empty[Row], 1), schema)
        if (partitionBy.nonEmpty)
          lake.writePartitioned(empty, partitionBy, SaveMode.Overwrite,
            overwriteSchema = true)
        else lake.write(empty, SaveMode.Overwrite, overwriteSchema = true)
      }
    }
    graft.sources.LakeNames.register(spark, db, table, path)
    Seq.empty
  }
}

/** `DROP TABLE [IF EXISTS] db.t` over a REGISTERED lake name: the name
  * is catalog metadata only (a view over the lake TVF), so dropping it
  * unregisters the name and leaves the data files in place — Delta's
  * external-table DROP semantics, and the statement a SQL-only user
  * reaches for (Spark's native DROP TABLE refuses because the name is
  * physically a view). Completes the pure-SQL lifecycle that `CREATE
  * TABLE … USING graft_lake LOCATION` opens (reference idiom,
  * 00-etl-rwd.py:158-200).
  */
final case class LakeDropNamedCommand(nameParts: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (db, table) = nameParts match {
      case Seq(t)    => (spark.catalog.currentDatabase, t)
      case Seq(d, t) => (d, t)
      case Seq(c, d, t) if c.equalsIgnoreCase("spark_catalog") => (d, t)
      case _ => throw new IllegalArgumentException(
        "DROP TABLE on a lake name expects `table` or `db.table`, got " +
          nameParts.mkString("."))
    }
    graft.sources.LakeNames.unregister(spark, db, table)
    Seq.empty
  }
}

/** `ANALYZE TABLE <lake> COMPUTE STATISTICS FOR COLUMNS …` — see
  * [[LakeSqlDml.parseAnalyze]]: collect (or, column-less, refresh) the
  * per-file skipping stats.
  */
final case class LakeAnalyzeCommand(
    path: String, cols: Seq[String], bloomFor: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = LakeTable(spark, path)
    if (cols.nonEmpty) lake.collectStats(cols, bloomFor)
    else lake.refreshStats()
    Seq.empty
  }
}

/** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] db.t [SHALLOW|DEEP] CLONE
  * <lake target> LOCATION '<dest>'` — Delta's CLONE statement. SHALLOW
  * records a manifest of the source's current files (zero data copy —
  * the dev/test-branch idiom at 100 TB); DEEP (also bare `CLONE`, like
  * Databricks' default) writes a full independent copy. Either way the
  * new table registers under the given name and starts a fresh history
  * with one CLONE commit. LOCATION is mandatory: graft lake tables are
  * path-backed.
  */
final case class LakeCloneCommand(
    nameParts: Seq[String], sourcePath: String, destPath: String,
    shallow: Boolean, orReplace: Boolean, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (db, table) = nameParts match {
      case Seq(t)    => (spark.catalog.currentDatabase, t)
      case Seq(d, t) => (d, t)
      case _ => throw new IllegalArgumentException(
        "CREATE TABLE … CLONE expects `table` or `db.table`, got " +
          nameParts.mkString("."))
    }
    val exists = spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
    if (exists && ifNotExists) return Seq.empty
    require(orReplace || !exists,
      s"table $db.$table already exists (use OR REPLACE or IF NOT EXISTS)")
    val src = LakeTable(spark, sourcePath)
    // validate the SOURCE before touching the destination: a typo'd
    // source path (or an uncloneable layout) must fail the statement
    // with the replace target's data intact
    src.validateCloneSource(shallow)
    // OR REPLACE replaces the DESTINATION too — cloneTo itself refuses a
    // non-empty destination, so a replace must clear it first
    if (orReplace) {
      val fs = new org.apache.hadoop.fs.Path(destPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(destPath), true): Unit
    }
    src.cloneTo(destPath, shallow)
    graft.sources.LakeNames.register(spark, db, table, destPath)
    Seq.empty
  }
}

/** `RESTORE graft_lake(path) TO VERSION AS OF <v>` /
  * `TO TIMESTAMP AS OF '<iso>'` — over a [[graft.sources.VersionedLakeTable]]
  * (append-only snapshots, so a bad restore is itself restorable).
  */
final case class LakeRestoreCommand(path: String, target: Either[Long, String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = graft.sources.VersionedLakeTable(spark, path)
    target match {
      case Left(v)   => t.restore(v)
      case Right(ts) => t.restoreAsOf(java.time.Instant.parse(ts))
    }
    Seq.empty
  }
}

/** `INSERT INTO | OVERWRITE graft_lake(path) [(cols)] VALUES …|SELECT …`.
  * Source values cast to the table's column types (Delta casts on
  * insert, so `VALUES (1.5)` into a DOUBLE column just works); an
  * explicit column list maps positionally and null-fills the rest. On a
  * versioned layout, INTO unions into a new snapshot and OVERWRITE
  * writes one — history-preserving either way.
  */
final case class LakeInsertCommand(
    path: String,
    overwrite: Boolean,
    columns: Seq[String],
    querySql: String,
    replaceWhere: Option[Column] = None) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val raw = spark.sql(
      if (querySql.trim.startsWith("(")) s"SELECT * FROM $querySql" else querySql)
    val named =
      if (columns.isEmpty) raw
      else {
        require(columns.length == raw.columns.length,
          s"INSERT column list has ${columns.length} names but the source " +
            s"produces ${raw.columns.length} columns")
        raw.toDF(columns: _*)
      }
    import org.apache.spark.sql.functions.{col, lit}
    def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    // computeIfAbsent: generated columns — a list that omits them leaves
    // their computation to the write path instead of null-filling (a
    // null-fill would fail their own validation, and Delta computes here)
    def aligned(
        schema: org.apache.spark.sql.types.StructType,
        computeIfAbsent: Set[String]) = {
      if (columns.isEmpty) {
        // SQL semantics: a list-less INSERT maps POSITIONALLY over the
        // full (writable) table schema (source column names are
        // irrelevant; generated values are provided and validated)
        require(named.columns.length == schema.fields.length,
          s"INSERT without a column list must cover every table column: " +
            s"table has ${schema.fields.length}, source produces ${named.columns.length}")
        named.toDF(schema.fieldNames.toIndexedSeq: _*)
          .select(schema.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      } else {
        // explicit list: every listed name must resolve to a table
        // column (Delta/Spark raise an analysis error here) — silently
        // dropping a typo'd name would discard its inserted values AND
        // null-fill the real column with no sign anything went wrong
        val schemaKeys = schema.fields.map(f => key(f.name)).toSet
        val unknown = columns.filterNot(c => schemaKeys.contains(key(c)))
        require(unknown.isEmpty,
          s"INSERT column list names columns not in the table: " +
            s"${unknown.mkString(", ")} (table columns: ${schema.fieldNames.mkString(", ")})")
        val have = columns.map(key).toSet
        // null-fill plain absent columns; leave absent GENERATED columns
        // out entirely so the write computes them
        val outFields = schema.fields.filter(f =>
          have.contains(key(f.name)) || !computeIfAbsent.contains(key(f.name)))
        val missing = outFields.filterNot(f => have.contains(key(f.name)))
        missing.foldLeft(named)((d, f) =>
            d.withColumn(f.name, lit(null).cast(f.dataType)))
          .select(outFields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      }
    }
    if (graft.sources.VersionedLakeTable.isVersioned(spark, path)) {
      val t = graft.sources.VersionedLakeTable(spark, path)
      val data = aligned(t.read.schema, Set.empty)
      replaceWhere match {
        case Some(cond) =>
          // history-preserving replaceWhere: survivors + batch as a NEW
          // snapshot (same incoming-rows-must-match contract)
          import org.apache.spark.sql.functions.coalesce
          val bad = data.where(!coalesce(cond, lit(false))).count()
          require(bad == 0L,
            s"replaceWhere: $bad incoming row(s) do not satisfy $cond")
          t.write(t.read.where(!coalesce(cond, lit(false))).unionByName(data))
        case None =>
          t.write(if (overwrite) data else t.read.unionByName(data))
      }
    } else {
      val lake = LakeTable(spark, path)
      // identity columns are GENERATED ALWAYS: never listable, never part
      // of the positional arity — the write assigns them
      val ids = lake.identityColumns.keys.map(key).toSet
      val listed = columns.filter(c => ids.contains(key(c)))
      require(listed.isEmpty,
        s"INSERT may not supply identity column(s) ${listed.mkString(", ")} — " +
          "they are GENERATED ALWAYS (engine-assigned)")
      val gens = lake.generatedColumns.keys.map(key).toSet
      val data = lake.tableSchema.map { s =>
        val writable = org.apache.spark.sql.types.StructType(
          s.fields.filterNot(f => ids.contains(key(f.name))))
        aligned(writable, gens)
      }.getOrElse(named)
      replaceWhere match {
        case Some(cond) => lake.replaceWhere(data, cond)
        case None =>
          lake.write(data,
            if (overwrite) org.apache.spark.sql.SaveMode.Overwrite
            else org.apache.spark.sql.SaveMode.Append)
      }
    }
    Seq.empty
  }
}

/** `ALTER TABLE graft_lake(path) ADD COLUMNS (…)` (metadata-only schema
  * evolution), `ADD CONSTRAINT n CHECK (…)` (validates existing data,
  * then gates every write), `DROP CONSTRAINT n`.
  */
/** `REORG TABLE graft_lake('<path>') APPLY (PURGE)`. */
final case class LakeReorgCommand(path: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    require(!graft.sources.VersionedLakeTable.isVersioned(spark, path),
      s"REORG TABLE targets a plain lake table; $path is a versioned layout")
    LakeTable(spark, path).reorgPurge()
    Seq.empty
  }
}

final case class LakeAlterCommand(path: String, action: LakeAlterCommand.Action)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // TBLPROPERTIES are log-level metadata both layouts share (the
    // versioned layout uses the same _graft_log); the schema-mutating
    // ALTERs remain plain-table-only
    val isProps = action match {
      case _: LakeAlterCommand.SetProperties | _: LakeAlterCommand.UnsetProperties => true
      case _ => false
    }
    require(isProps || !graft.sources.VersionedLakeTable.isVersioned(spark, path),
      s"ALTER TABLE targets a plain lake table; $path is a versioned snapshot layout")
    val lake = LakeTable(spark, path)
    action match {
      case LakeAlterCommand.AddColumns(schema)      => lake.addColumns(schema)
      case LakeAlterCommand.AddConstraint(n, expr)  => lake.addConstraint(n, expr)
      case LakeAlterCommand.DropConstraint(n)       => lake.dropConstraint(n)
      case LakeAlterCommand.AddGenerated(n, t, e)   =>
        lake.addGeneratedColumn(n,
          org.apache.spark.sql.types.DataType.fromDDL(t), e)
      case LakeAlterCommand.AddIdentity(n, s, st)   =>
        lake.addIdentityColumn(n, s, st)
      case LakeAlterCommand.RenameColumn(a, b)      => lake.renameColumn(a, b)
      case LakeAlterCommand.AlterColumnType(n, t)   =>
        lake.alterColumnType(n, org.apache.spark.sql.types.DataType.fromDDL(t))
      case LakeAlterCommand.DropColumn(n)           => lake.dropColumn(n)
      case LakeAlterCommand.SetProperties(kvs)      => lake.setTableProperties(kvs)
      case LakeAlterCommand.UnsetProperties(ks)     => lake.unsetTableProperties(ks)
    }
    Seq.empty
  }
}

object LakeAlterCommand {
  sealed trait Action
  final case class AddColumns(schema: StructType) extends Action
  final case class AddConstraint(name: String, exprSql: String) extends Action
  final case class DropConstraint(name: String) extends Action

  /** `ALTER TABLE t ADD GENERATED COLUMN name TYPE AS (expr)` — Delta's
    * GENERATED ALWAYS AS, reachable post-creation here (existing rows
    * backfill through one staged rewrite).
    */
  final case class AddGenerated(name: String, typeSql: String, exprSql: String)
      extends Action

  /** `ALTER TABLE t ADD IDENTITY COLUMN name [START WITH n]
    * [INCREMENT BY n]` — Delta's GENERATED ALWAYS AS IDENTITY, reachable
    * post-creation (existing rows backfill dense values).
    */
  final case class AddIdentity(name: String, start: Long, step: Long)
      extends Action

  /** `ALTER TABLE t RENAME COLUMN a TO b` — metadata-only via the
    * column mapping; no data files touched.
    */
  final case class RenameColumn(from: String, to: String) extends Action

  /** `ALTER TABLE t ALTER COLUMN c TYPE <wider>` — metadata-only numeric
    * type widening ([[graft.sources.LakeTable.alterColumnType]]).
    */
  final case class AlterColumnType(name: String, typeSql: String) extends Action

  /** `ALTER TABLE t DROP COLUMN a` — metadata-only via the column
    * mapping; the physical name is retired.
    */
  final case class DropColumn(name: String) extends Action

  /** `ALTER TABLE t SET TBLPROPERTIES ('k' = 'v', …)` — the SQL face of
    * [[graft.sources.LakeTable.setTableProperty]] (behavior-bearing
    * properties validate at set time, e.g. the symlink auto-manifest).
    */
  final case class SetProperties(kvs: Seq[(String, String)]) extends Action

  /** `ALTER TABLE t UNSET TBLPROPERTIES ('k', …)`. */
  final case class UnsetProperties(keys: Seq[String]) extends Action
}

/** `MERGE INTO graft_lake(path) t USING <relation> s ON ... WHEN ...`;
  * `relationSql` re-parses in run() as `SELECT * FROM <relationSql>`, so
  * table names, subqueries, and table functions all work as the source.
  */
final case class LakeMergeCommand(
    path: String,
    relationSql: String,
    keys: Seq[String],
    whenMatched: Seq[MergeClause],
    insertUnmatched: Boolean,
    insertCond: Option[Column],
    whenNotMatchedBySource: Seq[MergeClause],
    schemaEvolution: Boolean = false) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    require(!graft.sources.VersionedLakeTable.isVersioned(spark, path),
      s"MERGE INTO is not supported on the versioned snapshot layout at $path — " +
        "merge into a plain lake table, or apply the equivalent " +
        "delete/update/write as new versions")
    val source = spark.sql(s"SELECT * FROM $relationSql")
    LakeTable(spark, path).merge(source, keys, whenMatched, insertUnmatched, insertCond,
      whenNotMatchedBySource = whenNotMatchedBySource, schemaEvolution = schemaEvolution)
    Seq.empty
  }
}

/** `APPLY CHANGES INTO <lake> FROM <rel> KEYS (…) SEQUENCE BY <col>
  * [OP COLUMN <col>]` — see [[graft.sources.Scd.applyChanges]].
  */
final case class LakeApplyChangesCommand(
    path: String,
    relationSql: String,
    keys: Seq[String],
    sequenceCol: String,
    opCol: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    require(!graft.sources.VersionedLakeTable.isVersioned(spark, path),
      s"APPLY CHANGES INTO targets a plain lake table; $path is a versioned " +
        "snapshot layout")
    val changes = spark.sql(s"SELECT * FROM $relationSql")
    graft.sources.Scd.applyChanges(
      LakeTable(spark, path), changes, keys, sequenceCol, opCol)
    Seq.empty
  }
}

object LakeSqlDml {

  /** Session conf selecting how SQL DELETE executes on plain lake tables:
    * `copy-on-write` (default — staged file rewrite) or `merge-on-read`
    * (deletion vectors).
    */
  val DeleteModeKey = "spark.graft.lake.delete.mode"

  /** Returns Some(command) iff `sqlText` is one of the three DML statements
    * AND its target is `graft_lake('<path>')`; None otherwise (delegate).
    */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    val p = new P(sqlText, delegate)
    if (!p.more || p.peek.kind != Word) return None
    p.peek.text.toUpperCase(java.util.Locale.ROOT) match {
      case "DELETE"  => p.advance(); parseDelete(p)
      case "UPDATE"  => p.advance(); parseUpdate(p)
      case "MERGE"   => p.advance(); parseMerge(p)
      case "RESTORE" => p.advance(); parseRestore(p)
      case "ALTER"   => p.advance(); parseAlter(p)
      case "INSERT"  => p.advance(); parseInsert(p)
      case "OPTIMIZE" => p.advance(); parseOptimize(p)
      case "ANALYZE" => p.advance(); parseAnalyze(p)
      case "VACUUM"  => p.advance(); parseVacuum(p)
      case "COPY"    => p.advance(); parseCopy(p)
      case "REORG"   => p.advance(); parseReorg(p)
      case "CREATE"  => p.advance(); parseCreate(p)
      case "DROP"    => p.advance(); parseDrop(p)
      case "APPLY"   => p.advance(); parseApplyChanges(p)
      case "GENERATE" => p.advance(); parseGenerate(p)
      case "DESCRIBE" | "DESC" => p.advance(); parseDescribe(p, delegate)
      case "SHOW"    => p.advance(); parseShow(p)
      case _         => None
    }
  }

  /** `SHOW TBLPROPERTIES graft_lake('<path>')` — (key, value) rows from
    * the table-property store; every other SHOW falls through to Spark.
    */
  private def parseShow(p: P): Option[LogicalPlan] = {
    if (!p.eat("TBLPROPERTIES")) return None
    val path = p.lakeTarget().getOrElse(return None)
    p.done("SHOW TBLPROPERTIES")
    Some(LakeShowPropertiesCommand(path))
  }

  /** Delta's `DESCRIBE HISTORY t [LIMIT n]` / `DESCRIBE DETAIL t`
    * statement spellings — sugar over the graft_history / graft_detail
    * TVFs (same output schema; history latest-first like Delta).
    * Targets may be paths or registered names; every other DESCRIBE
    * (tables, functions, queries) falls through to Spark.
    */
  private def parseDescribe(p: P, delegate: ParserInterface): Option[LogicalPlan] = {
    val fn =
      if (p.eat("HISTORY")) "graft_history"
      else if (p.eat("DETAIL")) "graft_detail"
      else return None
    val path = p.lakeTarget().getOrElse(return None)
    val limit =
      if (fn == "graft_history" && p.eat("LIMIT")) Some(p.intLiteral("LIMIT row count"))
      else None
    p.done("DESCRIBE")
    val quoted = path.replace("\\", "\\\\").replace("'", "\\'")
    val order = if (fn == "graft_history") " ORDER BY version DESC" else ""
    Some(delegate.parsePlan(
      s"SELECT * FROM $fn('$quoted')$order" + limit.fold("")(n => s" LIMIT $n")))
  }

  /** Routing is decided by the PROVIDER: only `USING graft_lake` is ours,
    * so every step before that keyword must soft-fail back to Spark's
    * parser (views, databases, column-list CREATEs, other providers all
    * delegate with their native behavior and errors intact).
    */
  private def parseCreate(p: P): Option[LogicalPlan] = {
    val orReplace = p.eat("OR")
    if (orReplace && !p.eat("REPLACE")) return None
    if (!p.eat("TABLE")) return None
    var ifNotExists = false
    if (p.eat("IF")) {
      if (!p.eat("NOT") || !p.eat("EXISTS")) return None
      ifNotExists = true
    }
    if (!p.more || p.peek.kind != Word) return None
    def bare(s: String) = s.stripPrefix("`").stripSuffix("`")
    val name = Seq.newBuilder[String]
    name += bare(p.peek.text); p.advance()
    while (p.eatPunct(".")) {
      if (!p.more || p.peek.kind != Word) return None
      name += bare(p.peek.text); p.advance()
    }
    // schema-first column list (Delta's empty-table CREATE idiom):
    // captured here, applied only if the provider turns out to be ours —
    // column-list CREATEs for other providers still fall through intact
    val schemaDdl =
      if (p.more && p.peek.kind == Punct && p.peek.text == "(")
        Some(p.parenGroup("CREATE TABLE column list"))
      else None
    // Delta's CLONE statement: the target being a lake table (TVF form
    // or registered name) is what claims it — Spark has no CLONE syntax,
    // so a non-lake source just falls through to Spark's native error
    val shallowClone = p.eat("SHALLOW")
    val deepClone = !shallowClone && p.eat("DEEP")
    if (shallowClone || deepClone || p.wordIs("CLONE")) {
      if (schemaDdl.isDefined) return None // a column list on CLONE is not ours
      if (!p.eat("CLONE")) return None
      val src = p.lakeTarget().getOrElse(return None)
      // from here the statement is ours — errors are OUR errors
      p.expect("LOCATION",
        "in CREATE TABLE … CLONE (graft lake tables are path-backed)")
      val dest = p.stringLiteral("CLONE destination path")
      p.done("CREATE TABLE CLONE")
      return Some(LakeCloneCommand(name.result(), src, dest,
        shallow = shallowClone, orReplace = orReplace, ifNotExists = ifNotExists))
    }
    if (!p.eat("USING")) return None
    if (!p.more || p.peek.kind != Word ||
      !p.peek.text.equalsIgnoreCase("graft_lake")) return None
    p.advance()
    // from here the statement is ours — errors are OUR errors
    val partitionBy =
      if (p.eat("PARTITIONED")) {
        p.expect("BY", "after PARTITIONED")
        p.parenGroup("PARTITIONED BY column list")
          .split(',').toSeq.map(c => stripTicks(c.trim))
      } else Seq.empty
    p.expect("LOCATION", "in CREATE TABLE … USING graft_lake")
    val path = p.stringLiteral("LOCATION path")
    val ctas =
      if (p.eat("AS")) Some(p.sliceToEnd("CTAS query"))
      else { p.done("CREATE TABLE"); None }
    if (ctas.isDefined && schemaDdl.isDefined)
      p.fail("a column list and AS <query> are mutually exclusive in " +
        "CREATE TABLE … USING graft_lake (the query defines the schema)")
    if (ctas.isEmpty && schemaDdl.isEmpty && partitionBy.nonEmpty)
      p.fail("PARTITIONED BY needs AS <query> or a column list: registering " +
        "an existing lake table reads its on-disk layout as-is")
    Some(LakeCreateNamedCommand(name.result(), path, orReplace, ifNotExists,
      ctas, partitionBy, schemaDdl))
  }

  /** Routing is decided by RESOLUTION, not syntax: only `DROP TABLE` whose
    * bare multipart name resolves (via the active session) to a registered
    * lake name is ours — real tables, plain views, missing names, and any
    * trailing clause (PURGE, …) fall through to Spark's parser with native
    * behavior and errors intact.
    */
  private def parseDrop(p: P): Option[LogicalPlan] = {
    if (!p.eat("TABLE")) return None
    if (p.eat("IF") && !p.eat("EXISTS")) return None
    if (!p.more || p.peek.kind != Word) return None
    def bare(s: String) = s.stripPrefix("`").stripSuffix("`")
    val name = Seq.newBuilder[String]
    name += bare(p.peek.text); p.advance()
    while (p.eatPunct(".")) {
      if (!p.more || p.peek.kind != Word) return None
      name += bare(p.peek.text); p.advance()
    }
    if (p.more) return None // PURGE etc. — Spark's statement, Spark's rules
    val parts = name.result()
    val spark = org.apache.spark.sql.SparkSession.getActiveSession.getOrElse(return None)
    if (graft.sources.LakeNames.resolve(spark, parts).isEmpty) return None
    Some(LakeDropNamedCommand(parts))
  }

  /** `APPLY CHANGES INTO <lake> FROM <relation> KEYS (k1, …) SEQUENCE BY
    * <col> [OP COLUMN <col>]` — the DLT CDC-apply statement, routed to
    * [[graft.sources.Scd.applyChanges]]. Only a lake target claims the
    * statement; everything else falls through (Spark has no APPLY
    * syntax, so a non-lake target surfaces Spark's native parse error).
    */
  private def parseApplyChanges(p: P): Option[LogicalPlan] = {
    if (!p.eat("CHANGES")) return None
    if (!p.eat("INTO")) return None
    val path = p.lakeTarget().getOrElse(return None)
    p.expect("FROM", "in APPLY CHANGES INTO")
    val relationSql = p.slice(Set("KEYS"), "APPLY CHANGES source relation")
    p.expect("KEYS", "in APPLY CHANGES INTO (after the source relation)")
    val keys = p.parenGroup("KEYS column list")
      .split(',').toSeq.map(c => stripTicks(c.trim))
    p.expect("SEQUENCE", "in APPLY CHANGES INTO")
    p.expect("BY", "after SEQUENCE")
    val seqCol = p.identifier("SEQUENCE BY column").mkString(".")
    val opCol =
      if (p.eat("OP")) {
        p.expect("COLUMN", "after OP")
        p.identifier("OP COLUMN name").mkString(".")
      } else "_op"
    p.done("APPLY CHANGES")
    Some(LakeApplyChangesCommand(path, relationSql, keys, seqCol, opCol))
  }

  private def parseOptimize(p: P): Option[LogicalPlan] = {
    val path = p.lakeTarget().getOrElse(return None)
    val where =
      if (p.eat("WHERE"))
        Some(p.expr(p.slice(Set("ZORDER", "HILBERT"), "OPTIMIZE WHERE predicate")))
      else None
    def colList(kw: String): Seq[String] = {
      p.expect("BY", s"in OPTIMIZE … $kw")
      if (!p.eatPunct("(")) p.fail(s"expected ( after $kw BY")
      val names = Seq.newBuilder[String]
      names += p.identifier(s"${kw.toLowerCase} column").mkString(".")
      while (p.eatPunct(",")) names += p.identifier(s"${kw.toLowerCase} column").mkString(".")
      if (!p.eatPunct(")")) p.fail(s"unclosed $kw BY column list")
      names.result()
    }
    val (cols, hilbert) =
      if (p.eat("ZORDER")) (colList("ZORDER"), false)
      else if (p.eat("HILBERT")) (colList("HILBERT"), true)
      else (Seq.empty[String], false)
    p.done("OPTIMIZE")
    where match {
      case Some(w) =>
        if (cols.nonEmpty) p.fail(
          "OPTIMIZE … WHERE compacts whole partitions and does not combine " +
            "with ZORDER BY / HILBERT BY (cluster the partition's rows via the API instead)")
        Some(LakeMaintenanceCommand(path,
          LakeMaintenanceCommand.OptimizeWhere(org.apache.spark.sql.GraftBridge.column(w))))
      case None =>
        Some(LakeMaintenanceCommand(path, LakeMaintenanceCommand.Optimize(cols, hilbert)))
    }
  }

  /** `ANALYZE TABLE <lake> COMPUTE STATISTICS [FOR COLUMNS c1, c2, …
    * [BLOOM c3, …]]` — Spark's ANALYZE spelling routed to the lake's
    * file-skipping stats ([[LakeTable.collectStats]]; the column-less
    * form re-stats only unstatted files via [[LakeTable.refreshStats]]).
    * Non-lake targets fall through to Spark's own ANALYZE.
    */
  private def parseAnalyze(p: P): Option[LogicalPlan] = {
    if (!p.eat("TABLE")) return None
    val path = p.lakeTarget().getOrElse(return None)
    p.expect("COMPUTE", "in ANALYZE TABLE (lake tables support COMPUTE STATISTICS)")
    p.expect("STATISTICS", "after ANALYZE TABLE … COMPUTE")
    def idents(what: String): Seq[String] = {
      val names = Seq.newBuilder[String]
      names += p.identifier(what).mkString(".")
      while (p.eatPunct(",")) names += p.identifier(what).mkString(".")
      names.result()
    }
    val (cols, bloom) =
      if (p.eat("FOR")) {
        p.expect("COLUMNS", "after ANALYZE … FOR")
        val cs = idents("stats column")
        val bs = if (p.eat("BLOOM")) idents("bloom column") else Seq.empty
        (cs, bs)
      } else (Seq.empty[String], Seq.empty[String])
    p.done("ANALYZE TABLE")
    Some(LakeAnalyzeCommand(path, cols, bloom))
  }

  /** Delta's `GENERATE symlink_format_manifest FOR TABLE t` — external-
    * engine interop manifests, routed to
    * [[graft.sources.LakeTable.generateSymlinkManifest]].
    */
  private def parseGenerate(p: P): Option[LogicalPlan] = {
    // the mode is an identifier in Delta's grammar; only the symlink
    // mode exists
    if (!p.eat("SYMLINK_FORMAT_MANIFEST")) return None
    p.expect("FOR", "in GENERATE symlink_format_manifest")
    p.expect("TABLE", "in GENERATE symlink_format_manifest FOR")
    val path = p.lakeTarget().getOrElse(return None)
    p.done("GENERATE")
    Some(LakeMaintenanceCommand(path, LakeMaintenanceCommand.GenerateManifest))
  }

  private def parseVacuum(p: P): Option[LogicalPlan] = {
    val path = p.lakeTarget().getOrElse(return None)
    val changes = p.eat("CHANGES")
    // RETAIN <n> VERSIONS (count-based) or RETAIN <n> HOURS (time-based,
    // Delta's operational idiom — resolved through commit timestamps)
    var hours: Option[Long] = None
    val retain =
      if (p.eat("RETAIN")) {
        val n = p.intLiteral("RETAIN amount")
        if (p.eat("HOURS")) { hours = Some(n); None }
        else { p.expect("VERSIONS", "after RETAIN <n>"); Some(n.toInt) }
      } else None
    val dry = p.eat("DRY")
    if (dry) p.expect("RUN", "after DRY")
    p.done("VACUUM")
    val op =
      if (changes) {
        if (dry) p.fail("DRY RUN applies to VACUUM … RETAIN (snapshot retention)")
        LakeMaintenanceCommand.VacuumChanges(
          retain.getOrElse(p.fail(
            "VACUUM … CHANGES needs RETAIN <n> VERSIONS (how much feed to keep)")))
      } else hours match {
        case Some(h) => LakeMaintenanceCommand.VacuumHours(h.toDouble, dry)
        case None    => LakeMaintenanceCommand.Vacuum(retain, dry)
      }
    Some(LakeMaintenanceCommand(path, op))
  }

  /** `COPY INTO <lake target> FROM '<source dir>' [FILEFORMAT = <fmt>]
    * [SCHEMA '<ddl>'] [WITH QUARANTINE]` — Databricks COPY INTO's core
    * shape: idempotent exactly-once file ingest (re-running loads only
    * files not yet loaded). WITH QUARANTINE routes through the JSONL
    * quarantine split (bad lines to the `__quarantine` sibling,
    * verbatim + source file); it requires FILEFORMAT = JSONL and an
    * explicit SCHEMA — the quarantine split IS a contract check, and a
    * contract needs a declared schema.
    */
  private def parseCopy(p: P): Option[LogicalPlan] = {
    if (!p.eat("INTO")) return None
    val path = p.lakeTarget().getOrElse(return None)
    p.expect("FROM", "in COPY INTO")
    val src = p.stringLiteral("COPY INTO source path")
    val fmt =
      if (p.eat("FILEFORMAT")) {
        if (!p.eatPunct("=")) p.fail("expected = after FILEFORMAT")
        p.identifier("file format").mkString(".").toLowerCase(java.util.Locale.ROOT)
      } else "parquet"
    val schemaDdl =
      if (p.eat("SCHEMA")) Some(p.stringLiteral("SCHEMA DDL string")) else None
    val quarantine = p.eat("WITH")
    if (quarantine) p.expect("QUARANTINE", "after WITH")
    p.done("COPY INTO")
    if (quarantine) {
      if (fmt != "jsonl" && fmt != "json")
        p.fail("COPY INTO … WITH QUARANTINE supports FILEFORMAT = JSONL")
      val ddl = schemaDdl.getOrElse(p.fail(
        "COPY INTO … WITH QUARANTINE needs SCHEMA '<ddl>' — the " +
          "quarantine split is a contract check and needs the contract"))
      Some(LakeCopyIntoQuarantineCommand(path, src, ddl))
    } else {
      schemaDdl.foreach(_ => p.fail(
        "SCHEMA on COPY INTO is only used WITH QUARANTINE — the plain " +
          "path takes the table's stored schema"))
      Some(LakeCopyIntoCommand(path, src, fmt))
    }
  }

  private def parseInsert(p: P): Option[LogicalPlan] = {
    val overwrite = p.eat("OVERWRITE")
    if (!overwrite && !p.eat("INTO")) return None
    if (overwrite) p.eat("TABLE"): Unit
    val path = p.lakeTarget().getOrElse(return None)
    // Delta's `INSERT INTO t REPLACE WHERE cond SELECT …`: the predicate
    // runs to the source query's leading keyword (a scalar subquery
    // inside the predicate is not supported here — Delta's grammar has
    // the same keyword-boundary shape)
    val replaceWhere =
      if (!overwrite && p.eat("REPLACE")) {
        p.expect("WHERE", "after INSERT INTO … REPLACE")
        Some(stripQualifier(p.expr(
          p.slice(Set("SELECT", "VALUES", "TABLE", "FROM"),
            "REPLACE WHERE predicate")), None))
      } else None
    // an optional (col, …) list — but `(SELECT …)` is a source, not a list
    val cols =
      if (p.peekIsColumnList) {
        p.eatPunct("("): Unit
        val names = Seq.newBuilder[String]
        names += p.identifier("insert column").mkString(".")
        while (p.eatPunct(",")) names += p.identifier("insert column").mkString(".")
        if (!p.eatPunct(")")) p.fail("unclosed INSERT column list")
        names.result()
      } else Seq.empty
    val source = p.sliceToEnd("insert source")
    Some(LakeInsertCommand(path, overwrite, cols, source, replaceWhere))
  }

  /** Delta `REORG TABLE t APPLY (PURGE)`: physically drop retired
    * columns' bytes and normalize files to logical names (column-mapping
    * debt paid explicitly).
    */
  private def parseReorg(p: P): Option[LogicalPlan] = {
    if (!p.eat("TABLE")) return None
    val path = p.lakeTarget().getOrElse(return None)
    p.expect("APPLY", "in REORG TABLE")
    val body = p.parenGroup("REORG APPLY clause").trim
    require(body.equalsIgnoreCase("PURGE"),
      s"REORG TABLE supports APPLY (PURGE), got APPLY ($body)")
    p.done("REORG TABLE")
    Some(LakeReorgCommand(path))
  }

  private def parseAlter(p: P): Option[LogicalPlan] = {
    if (!p.eat("TABLE")) return None
    val path = p.lakeTarget().getOrElse(return None)
    val action =
      if (p.eat("ADD")) {
        if (p.eat("GENERATED")) {
          p.expect("COLUMN", "after ALTER TABLE … ADD GENERATED")
          val name = p.identifier("generated column name").mkString(".")
          val typeSql = p.slice(Set("AS"), "generated column type")
          p.expect("AS", "in ADD GENERATED COLUMN")
          LakeAlterCommand.AddGenerated(name, typeSql,
            p.parenGroup("generated expression"))
        } else if (p.eat("IDENTITY")) {
          p.expect("COLUMN", "after ALTER TABLE … ADD IDENTITY")
          val name = p.identifier("identity column name").mkString(".")
          val start =
            if (p.eat("START")) { p.expect("WITH", "in START WITH"); p.intLiteral("identity start") }
            else 1L
          val step =
            if (p.eat("INCREMENT")) { p.expect("BY", "in INCREMENT BY"); p.intLiteral("identity step") }
            else 1L
          LakeAlterCommand.AddIdentity(name, start, step)
        } else if (p.eat("COLUMNS") || p.eat("COLUMN")) {
          LakeAlterCommand.AddColumns(p.parseSchema(p.parenGroup("column list")))
        } else if (p.eat("CONSTRAINT")) {
          val name = p.identifier("constraint name").mkString(".")
          p.expect("CHECK", "in ADD CONSTRAINT")
          LakeAlterCommand.AddConstraint(name, p.parenGroup("CHECK expression"))
        } else p.fail(
          "expected COLUMNS, CONSTRAINT, GENERATED COLUMN or IDENTITY COLUMN " +
            "after ALTER TABLE … ADD")
      } else if (p.eat("DROP")) {
        if (p.eat("CONSTRAINT"))
          LakeAlterCommand.DropConstraint(p.identifier("constraint name").mkString("."))
        else if (p.eat("COLUMN"))
          LakeAlterCommand.DropColumn(p.identifier("column name").mkString("."))
        else p.fail("expected CONSTRAINT or COLUMN after ALTER TABLE … DROP")
      } else if (p.eat("RENAME")) {
        p.expect("COLUMN", "after ALTER TABLE … RENAME")
        val from = p.identifier("column name").mkString(".")
        p.expect("TO", "in RENAME COLUMN")
        LakeAlterCommand.RenameColumn(from, p.identifier("new column name").mkString("."))
      } else if (p.eat("ALTER")) {
        // Delta 4.0: ALTER TABLE t ALTER COLUMN c TYPE <wider> —
        // metadata-only numeric type widening
        p.expect("COLUMN", "after ALTER TABLE … ALTER")
        val name = p.identifier("column name").mkString(".")
        p.expect("TYPE", "in ALTER COLUMN")
        LakeAlterCommand.AlterColumnType(name, p.sliceToEnd("column type"))
      } else if (p.eat("SET")) {
        p.expect("TBLPROPERTIES", "after ALTER TABLE … SET")
        val body = p.parenGroup("TBLPROPERTIES list")
        // the WHOLE body must be well-formed pairs — findAllMatchIn alone
        // would silently skip a malformed entry, and a property the user
        // believes set but isn't is worse than a parse error
        val pair = """'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'"""
        if (!body.trim.matches(s"$pair(\\s*,\\s*$pair)*"))
          p.fail("SET TBLPROPERTIES needs ('key' = 'value', …), all entries quoted")
        val kvs = pair.r.findAllMatchIn(body)
          .map(m => m.group(1).replace("''", "'") -> m.group(2).replace("''", "'"))
          .toSeq
        LakeAlterCommand.SetProperties(kvs)
      } else if (p.eat("UNSET")) {
        p.expect("TBLPROPERTIES", "after ALTER TABLE … UNSET")
        val body = p.parenGroup("TBLPROPERTIES list")
        val key = """'((?:[^']|'')*)'"""
        if (!body.trim.matches(s"$key(\\s*,\\s*$key)*"))
          p.fail("UNSET TBLPROPERTIES needs ('key', …), all keys quoted")
        val ks = key.r.findAllMatchIn(body).map(_.group(1).replace("''", "'")).toSeq
        LakeAlterCommand.UnsetProperties(ks)
      } else p.fail(
        "expected ADD, DROP, RENAME, SET or UNSET after the ALTER TABLE target")
    p.done("ALTER TABLE")
    Some(LakeAlterCommand(path, action))
  }

  private def parseRestore(p: P): Option[LogicalPlan] = {
    p.eat("TABLE"): Unit // Delta writes RESTORE TABLE; both accepted
    val path = p.lakeTarget().getOrElse(return None)
    p.expect("TO", "in RESTORE")
    val target =
      if (p.eat("VERSION")) {
        p.expect("AS", "in VERSION AS OF"); p.expect("OF", "in VERSION AS OF")
        Left(p.intLiteral("restore version"))
      } else if (p.eat("TIMESTAMP")) {
        p.expect("AS", "in TIMESTAMP AS OF"); p.expect("OF", "in TIMESTAMP AS OF")
        Right(p.stringLiteral("restore timestamp"))
      } else p.fail("expected VERSION AS OF or TIMESTAMP AS OF")
    p.done("RESTORE")
    Some(LakeRestoreCommand(path, target))
  }

  private def parseDelete(p: P): Option[LogicalPlan] = {
    if (!p.eat("FROM")) return None
    val path = p.lakeTarget().getOrElse(return None)
    val alias = p.targetAlias(stop = Set("WHERE"))
    val cond =
      if (p.eat("WHERE")) stripQualifier(p.expr(p.sliceToEnd("WHERE condition")), alias)
      else org.apache.spark.sql.functions.lit(true)
    p.done("DELETE")
    Some(LakeDeleteCommand(path, cond))
  }

  private def parseUpdate(p: P): Option[LogicalPlan] = {
    val path = p.lakeTarget().getOrElse(return None)
    val alias = p.targetAlias(stop = Set("SET"))
    p.expect("SET", "in UPDATE")
    val set = parseAssignments(p, stops = Set("WHERE")).map { case (lhs, rhsSql) =>
      unqualify(lhs, alias, "UPDATE SET") -> stripQualifier(p.expr(rhsSql), alias)
    }
    val cond =
      if (p.eat("WHERE")) stripQualifier(p.expr(p.sliceToEnd("WHERE condition")), alias)
      else org.apache.spark.sql.functions.lit(true)
    p.done("UPDATE")
    Some(LakeUpdateCommand(path, set, cond))
  }

  private def parseMerge(p: P): Option[LogicalPlan] = {
    // Delta's `MERGE WITH SCHEMA EVOLUTION INTO …` placement
    val schemaEvolution = p.eat("WITH") && {
      p.expect("SCHEMA", "after MERGE WITH")
      p.expect("EVOLUTION", "after MERGE WITH SCHEMA")
      true
    }
    if (!p.eat("INTO")) return None
    val path = p.lakeTarget().getOrElse(return None)
    val tAlias = p.targetAlias(stop = Set("USING"))
    p.expect("USING", "in MERGE")
    val (relationSql, sAlias) = p.sourceRelation()
    p.expect("ON", "in MERGE (after the source relation)")
    val keys = mergeKeys(p.expr(p.slice(Set("WHEN"), "ON condition")), tAlias, sAlias)

    val matched = Seq.newBuilder[MergeClause]
    val bySource = Seq.newBuilder[MergeClause]
    var insert: Option[Option[Column]] = None // Some(cond?) once an INSERT clause seen
    var sawClause = false
    while (p.eat("WHEN")) {
      sawClause = true
      val not = p.eat("NOT")
      p.expect("MATCHED", "after WHEN" + (if (not) " NOT" else ""))
      val bySrc = not && p.eat("BY")
      if (bySrc) p.expect("SOURCE", "after WHEN NOT MATCHED BY")
      val condSql = if (p.eat("AND")) Some(p.slice(Set("THEN"), "clause condition")) else None
      p.expect("THEN", "in WHEN clause")
      if (!not || bySrc) {
        // target-only clauses (BY SOURCE) must not touch source columns —
        // there is no source row on those target rows
        def checked(c: Column): Column = {
          if (bySrc) GraftBridge.expression(c).foreach {
            case a: UnresolvedAttribute if a.nameParts.length > 1 &&
              a.nameParts.head.equalsIgnoreCase("s") =>
              p.fail("WHEN NOT MATCHED BY SOURCE cannot reference the source " +
                s"(`${a.name}`): no source row exists for an unmatched target row")
            case _ =>
          }
          c
        }
        val out = if (bySrc) bySource else matched
        val cond = condSql.map(c => checked(realias(p.expr(c), tAlias, sAlias)))
        if (p.eat("UPDATE")) {
          p.expect("SET", s"in WHEN${if (bySrc) " NOT MATCHED BY SOURCE" else " MATCHED"} THEN UPDATE")
          val set = parseAssignments(p, stops = Set("WHEN")).map { case (lhs, rhsSql) =>
            unqualify(lhs, tAlias, "MERGE UPDATE SET") ->
              checked(realias(p.expr(rhsSql), tAlias, sAlias))
          }
          out += MergeClause.UpdateWhen(set.toMap, cond)
        } else if (p.eat("DELETE")) {
          out += MergeClause.DeleteWhen(cond)
        } else p.fail("expected UPDATE SET or DELETE in this WHEN clause")
      } else {
        p.expect("INSERT", "after WHEN NOT MATCHED THEN")
        if (!p.eatPunct("*"))
          p.fail("only `WHEN NOT MATCHED [AND cond] THEN INSERT *` is supported — " +
            "the lake merge inserts whole source rows; project the source relation instead")
        require(insert.isEmpty, "at most one WHEN NOT MATCHED clause is supported")
        // the insert condition evaluates over the UNQUALIFIED source row
        insert = Some(condSql.map { c =>
          val e = p.expr(c)
          e.foreach {
            case a: UnresolvedAttribute if a.nameParts.length > 1 &&
              tAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
              p.fail(s"WHEN NOT MATCHED condition cannot reference the target " +
                s"(`${a.name}`): no target row exists for an unmatched source row")
            case _ =>
          }
          stripQualifier(e, sAlias)
        })
      }
    }
    if (!sawClause) p.fail("MERGE needs at least one WHEN clause")
    p.done("MERGE")
    Some(LakeMergeCommand(path, relationSql, keys,
      matched.result(), insertUnmatched = insert.isDefined, insertCond = insert.flatten,
      whenNotMatchedBySource = bySource.result(), schemaEvolution = schemaEvolution))
  }

  /** `lhs = expr {, lhs = expr}` up to a top-level stop keyword or EOF. */
  private def parseAssignments(p: P, stops: Set[String]): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var continue = true
    while (continue) {
      val lhs = p.identifier("assignment target")
      if (!p.eatPunct("=")) p.fail(s"expected `=` after `${lhs.mkString(".")}`")
      val rhs = p.slice(stops, "assignment value", stopPunct = Set(","))
      out += ((lhs.mkString("."), rhs))
      continue = p.eatPunct(",")
    }
    out.result()
  }

  /** ON must be a conjunction of target.key = source.key equalities over the
    * SAME column name — the equi-key join shape [[LakeTable.merge]] executes
    * (and the shape that shuffles/broadcasts cleanly at scale).
    */
  private def mergeKeys(
      on: Expression, tAlias: Option[String], sAlias: Option[String]): Seq[String] = {
    def qualifier(a: UnresolvedAttribute): Option[String] =
      if (a.nameParts.length > 1) Some(a.nameParts.head) else None
    def keyOf(e: Expression): Seq[String] = e match {
      case And(l, r) => keyOf(l) ++ keyOf(r)
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val (an, bn) = (a.nameParts.last, b.nameParts.last)
        require(an.equalsIgnoreCase(bn),
          s"ON equality must join the same column name on both sides, got ${a.name} = ${b.name}")
        val quals = Seq(a, b).flatMap(qualifier)
        require(quals.forall(q =>
          tAlias.exists(_.equalsIgnoreCase(q)) || sAlias.exists(_.equalsIgnoreCase(q))),
          s"ON qualifiers must be the target/source aliases, got ${a.name} = ${b.name}")
        Seq(an)
      case other => throw new IllegalArgumentException(
        s"MERGE ON must be a conjunction of t.key = s.key equalities; " +
          s"cannot translate `${other.sql}` to an equi-key merge")
    }
    val keys = keyOf(on)
    require(keys.distinct.size == keys.size, s"duplicate ON keys: $keys")
    keys
  }

  /** Rewrite user aliases to the `t`/`s` aliases [[LakeTable.merge]] binds. */
  private def realias(
      e: Expression, tAlias: Option[String], sAlias: Option[String]): Column =
    GraftBridge.column(e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
        tAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        UnresolvedAttribute("t" +: a.nameParts.tail)
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
        sAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        UnresolvedAttribute("s" +: a.nameParts.tail)
    })

  /** Drop a single-table alias qualifier (`u.v` -> `v`) so the expression
    * resolves against the unaliased table [[LakeTable.delete]]/update read.
    */
  private def stripQualifier(e: Expression, alias: Option[String]): Column =
    GraftBridge.column(e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
        alias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    })

  private def unqualify(lhs: String, alias: Option[String], ctx: String): String = {
    val parts = lhs.split('.')
    if (parts.length == 1) stripTicks(parts(0))
    else if (parts.length == 2 && alias.exists(_.equalsIgnoreCase(parts(0))))
      stripTicks(parts(1))
    else throw new IllegalArgumentException(
      s"$ctx target `$lhs` must be a column of the lake table " +
        alias.fold("(unqualified)")(a => s"(optionally qualified as `$a`)"))
  }

  private def stripTicks(s: String): String = s.stripPrefix("`").stripSuffix("`")

  // ---------------------------------------------------------------- lexer

  private sealed trait Kind
  private case object Word extends Kind
  private case object Str extends Kind
  private case object Num extends Kind
  private case object Punct extends Kind

  private final case class Tok(text: String, start: Int, end: Int, kind: Kind)

  private val MultiOps = Seq("<=>", "==", "<=", ">=", "!=", "<>", "&&", "||", "->", "=>")

  private def tokenize(sql: String): IndexedSeq[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        while (i < n && sql(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        val e = sql.indexOf("*/", i + 2); i = if (e < 0) n else e + 2
      } else if (c == '\'' || c == '"') {
        val start = i; i += 1
        var open = true
        while (i < n && open) {
          if (sql(i) == '\\' && i + 1 < n) i += 2
          else if (sql(i) == c) {
            if (c == '\'' && i + 1 < n && sql(i + 1) == '\'') i += 2 // '' escape
            else { open = false; i += 1 }
          } else i += 1
        }
        out += Tok(sql.substring(start, i), start, i, Str)
      } else if (c == '`') {
        val start = i; i += 1
        while (i < n && sql(i) != '`') i += 1
        i = math.min(i + 1, n)
        out += Tok(sql.substring(start, i), start, i, Word)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        out += Tok(sql.substring(start, i), start, i, Word)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '.')) i += 1
        out += Tok(sql.substring(start, i), start, i, Num)
      } else MultiOps.find(op => sql.startsWith(op, i)) match {
        case Some(op) => out += Tok(op, i, i + op.length, Punct); i += op.length
        case None     => out += Tok(c.toString, i, i + 1, Punct); i += 1
      }
    }
    out.result()
  }

  // --------------------------------------------------------------- cursor

  private final class P(val sql: String, delegate: ParserInterface) {
    private val toks = tokenize(sql)
    private var i = 0

    def more: Boolean = i < toks.length && !(toks(i).kind == Punct && toks(i).text == ";")
    def peek: Tok = toks(i)
    def advance(): Unit = i += 1
    def kind: Kind = toks(i).kind

    def wordIs(w: String): Boolean =
      more && toks(i).kind == Word && toks(i).text.equalsIgnoreCase(w)
    def eat(w: String): Boolean = { val ok = wordIs(w); if (ok) i += 1; ok }
    def expect(w: String, ctx: String): Unit =
      if (!eat(w)) fail(s"expected $w $ctx" +
        (if (more) s", found `${toks(i).text}`" else ", found end of statement"))
    def eatPunct(pt: String): Boolean = {
      val ok = more && toks(i).kind == Punct && toks(i).text == pt
      if (ok) i += 1
      ok
    }

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"graft lake DML: $msg in: $sql")

    def expr(sqlFragment: String): Expression = {
      if (sqlFragment.trim.isEmpty) fail("empty expression")
      delegate.parseExpression(sqlFragment)
    }

    /** The lake path of the statement target at the cursor, or None
      * (→ delegate): either the `graft_lake ( '<path>' )` TVF form, or a
      * (possibly dotted) table name registered via
      * [[graft.sources.LakeNames]]. A name that exists but is NOT a
      * registered lake table rewinds and delegates, so native DML
      * behavior and native errors on ordinary tables are untouched.
      */
    def lakeTarget(): Option[String] =
      if (wordIs("graft_lake")) {
        val save = i
        i += 1
        if (!eatPunct("(")) { i = save; return None }
        if (!more || toks(i).kind != Str || toks(i).text.head != '\'') { i = save; return None }
        val raw = toks(i).text; i += 1
        if (!eatPunct(")")) { i = save; return None }
        Some(raw.substring(1, raw.length - 1).replace("''", "'").replace("\\'", "'"))
      } else namedLakeTarget()

    private def namedLakeTarget(): Option[String] = {
      if (!more || toks(i).kind != Word) return None
      val save = i
      val parts = Seq.newBuilder[String]
      parts += toks(i).text; i += 1
      while (eatPunct(".")) {
        if (!more || toks(i).kind != Word) { i = save; return None }
        parts += toks(i).text; i += 1
      }
      val resolved = org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(s => graft.sources.LakeNames.resolve(s, parts.result()))
      if (resolved.isEmpty) i = save
      resolved
    }

    /** Optional `[AS] alias` after the target (alias may not be a keyword
      * that starts the next clause).
      */
    def targetAlias(stop: Set[String]): Option[String] = {
      val as = eat("AS")
      if (more && toks(i).kind == Word && !stop.exists(toks(i).text.equalsIgnoreCase)) {
        val a = stripTicks(toks(i).text); i += 1; Some(a)
      } else if (as) fail("expected alias after AS")
      else None
    }

    /** Source relation of MERGE USING: raw text up to top-level ON, with a
      * trailing `[AS] alias` split off (a bare trailing word not preceded
      * by `.` is the alias; `db.tbl`, `fn(...)`, `(subquery)` are not).
      */
    def sourceRelation(): (String, Option[String]) = {
      val from = i
      slice(Set("ON"), "source relation"): Unit
      val range = toks.slice(from, i)
      if (range.isEmpty) fail("missing source relation after USING")
      val hasAlias = range.length >= 2 && range.last.kind == Word &&
        range(range.length - 2).text != "."
      if (hasAlias) {
        val asDropped =
          if (range.length >= 3 && range(range.length - 2).kind == Word &&
            range(range.length - 2).text.equalsIgnoreCase("AS")) range.dropRight(2)
          else range.dropRight(1)
        if (asDropped.isEmpty) fail("missing source relation before alias")
        (sql.substring(asDropped.head.start, asDropped.last.end),
          Some(stripTicks(range.last.text)))
      } else (sql.substring(range.head.start, range.last.end), None)
    }

    /** At an INSERT target: does `( …` open a COLUMN LIST (bare word then
      * `,` or `)`) rather than a `(SELECT …)` source?
      */
    def peekIsColumnList: Boolean = {
      if (!more || toks(i).kind != Punct || toks(i).text != "(") return false
      if (i + 1 >= toks.length || toks(i + 1).kind != Word) return false
      if (toks(i + 1).text.equalsIgnoreCase("SELECT") ||
        toks(i + 1).text.equalsIgnoreCase("VALUES")) return false
      i + 2 < toks.length && toks(i + 2).kind == Punct &&
        (toks(i + 2).text == "," || toks(i + 2).text == ")" || toks(i + 2).text == ".")
    }

    /** Raw text of a `( … )` group at the cursor (nested parens fine). */
    def parenGroup(what: String): String = {
      if (!eatPunct("(")) fail(s"expected ( before $what")
      val inner = slice(Set.empty, what, stopPunct = Set(")"))
      if (!eatPunct(")")) fail(s"unclosed ( around $what")
      inner
    }

    def parseSchema(ddl: String): StructType = delegate.parseTableSchema(ddl)

    def intLiteral(what: String): Long = {
      if (!more || toks(i).kind != Num) fail(s"expected an integer $what")
      val t = toks(i).text
      i += 1
      try t.toLong catch { case _: NumberFormatException => fail(s"bad integer $what: $t") }
    }

    def stringLiteral(what: String): String = {
      if (!more || toks(i).kind != Str || toks(i).text.head != '\'')
        fail(s"expected a quoted string $what")
      val raw = toks(i).text
      i += 1
      raw.substring(1, raw.length - 1).replace("''", "'").replace("\\'", "'")
    }

    /** Possibly-dotted identifier, returned as its parts joined by `.`. */
    def identifier(ctx: String): Seq[String] = {
      if (!more || toks(i).kind != Word) fail(s"expected identifier for $ctx")
      val parts = Seq.newBuilder[String]
      parts += toks(i).text; i += 1
      while (eatPunct(".")) {
        if (!more || toks(i).kind != Word) fail(s"dangling `.` in $ctx")
        parts += toks(i).text; i += 1
      }
      parts.result()
    }

    /** Consume to the next TOP-LEVEL stop keyword/punct (or EOF) and return
      * the raw text slice — the unit handed back to Spark's expression
      * parser. Paren depth and string literals are token-aware, and a
      * `CASE … END` span shields its internal WHEN/THEN/ELSE from clause
      * keyword detection (SET v = CASE WHEN … THEN … END must not end the
      * assignment at the CASE's own keywords).
      */
    def slice(stops: Set[String], what: String, stopPunct: Set[String] = Set.empty): String = {
      val from = if (more) toks(i).start else sql.length
      var end = from
      var depth = 0
      var caseDepth = 0
      var open = true
      while (more && open) {
        val t = toks(i)
        val stopHere = depth == 0 && caseDepth == 0 &&
          ((t.kind == Word && stops.exists(t.text.equalsIgnoreCase)) ||
            (t.kind == Punct && stopPunct.contains(t.text)))
        if (stopHere) open = false
        else {
          if (t.kind == Punct && t.text == "(") depth += 1
          else if (t.kind == Punct && t.text == ")") depth -= 1
          else if (t.kind == Word && t.text.equalsIgnoreCase("CASE")) caseDepth += 1
          else if (t.kind == Word && t.text.equalsIgnoreCase("END") && caseDepth > 0)
            caseDepth -= 1
          end = t.end
          i += 1
        }
      }
      val s = sql.substring(from, end).trim
      if (s.isEmpty) fail(s"empty $what")
      s
    }

    def sliceToEnd(what: String): String = slice(Set.empty, what)

    /** All tokens must be consumed (trailing `;` tolerated). */
    def done(stmt: String): Unit =
      if (more) fail(s"unexpected `${toks(i).text}` after complete $stmt statement")
  }
}
