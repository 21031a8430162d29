package graft.sources

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier

/** Named lake tables in the session catalog (SURVEY §2 A4-A6 depth).
  *
  * The reference's primary idiom is NAMED tables — `CREATE TABLE
  * rwd_hls.patient_encounters … LOCATION` then every dashboard queries by
  * name (reference: 00-etl-rwd.py:158-200, 01-rwe-dashboard.r:14-15). The
  * lake's full feature set (DML, history, time travel, CDC) was previously
  * reachable only through `graft_lake('<path>')` TVFs; this maps
  * `db.name -> lake path` so the same statements work by name:
  *
  * {{{
  * LakeNames.register(spark, "rwd", "encounters", "/lake/encounters")
  * spark.sql("DELETE FROM rwd.encounters WHERE status = 'void'")
  * spark.sql("SELECT * FROM rwd.encounters")                 // current
  * spark.sql("SELECT * FROM graft_lake('rwd.encounters', 3)") // time travel
  * }}}
  *
  * Mechanism: the name is a catalog VIEW over the `graft_lake` TVF whose
  * `graft.lake.path` table property carries the lake path.
  *   - READS resolve through the view: the TVF re-reads the lake's
  *     authoritative stored schema at every analysis, and `WITH SCHEMA
  *     EVOLUTION` lets the view track it — so ADD COLUMNS and mergeSchema
  *     appends surface by name with no re-registration, and filters push
  *     into the spliced parquet scan exactly as with the path form.
  *   - DML resolves through the property: [[graft.plans.LakeSqlDml]] looks
  *     the target name up here at parse time and routes to the same
  *     LakeTable/VersionedLakeTable calls as the path form. A name WITHOUT
  *     the property (a plain parquet table, a temp view) is left to Spark's
  *     parser untouched, so native behavior and native errors are preserved.
  *
  * A view (not an external parquet table) because both lake layouts need
  * indirection a static LOCATION cannot give: the versioned layout's
  * `_v{N}` snapshot dirs are invisible to a plain parquet scan, and the
  * plain layout's authoritative schema lives in the lake log, not the
  * catalog.
  *
  * VISIBILITY ACROSS SESSIONS: the view lives in the catalog's
  * ExternalCatalog, which belongs to the SparkContext-wide SharedState —
  * so every `spark.newSession()` of the same application sees registered
  * names immediately (LakeNamesSessionSpec pins this). A FRESH PROCESS
  * with the default in-memory catalog starts empty: attach by calling
  * [[register]] again — it is stateless and idempotent, because
  * everything authoritative (data, schema, history, constraints) lives
  * in the lake directory itself, never in the catalog entry
  * (CrossProcessProbe phase D drives exactly this attach-then-DML flow
  * from a forked JVM). Deployments with a persistent metastore (Hive)
  * keep the view across applications — the mechanism is an ordinary
  * catalog view + table property, nothing in-memory-specific.
  */
object LakeNames {

  /** Table property naming the lake path a registered view points at. */
  val PathProperty = "graft.lake.path"

  /** Escape a path for splicing into a single-quoted Spark SQL literal
    * (the TVF consumes the literal directly — no Hadoop glob layer, unlike
    * [[Catalog]] LOCATION clauses).
    */
  private def sqlQuote(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Register `db`.`table` as a named lake table over `path` (either
    * layout). Idempotent: re-registering replaces the prior mapping.
    */
  def register(spark: SparkSession, db: String, table: String, path: String): Unit = {
    Catalog.createDatabase(spark, db)
    spark.sql(
      s"""CREATE OR REPLACE VIEW `$db`.`$table`
         |WITH SCHEMA EVOLUTION
         |TBLPROPERTIES ('$PathProperty' = '${sqlQuote(path)}')
         |AS SELECT * FROM graft_lake('${sqlQuote(path)}')""".stripMargin)
  }

  def unregister(spark: SparkSession, db: String, table: String): Unit =
    spark.sql(s"DROP VIEW IF EXISTS `$db`.`$table`")

  /** The lake path behind a (possibly qualified) table name, if the name
    * resolves to a registered lake table; None otherwise — including names
    * that do not exist or resolve to non-lake tables, so callers can fall
    * through to native Spark handling.
    */
  def resolve(spark: SparkSession, parts: Seq[String]): Option[String] = {
    val ident = parts.map(stripTicks) match {
      case Seq(t)     => TableIdentifier(t)
      case Seq(d, t)  => TableIdentifier(t, Some(d))
      // the default session catalog spelled explicitly
      case Seq(c, d, t) if c.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(d), Some(c))
      case _ => return None
    }
    try {
      val meta = spark.sessionState.catalog.getTempViewOrPermanentTableMetadata(ident)
      meta.properties.get(PathProperty)
    } catch {
      case _: AnalysisException => None // no such db/table -> not a lake name
    }
  }

  /** [[resolve]] over a dotted string (`db.t`, backticks honored) — the
    * form the TVFs accept in place of a path. A string containing `/` is
    * always a path, never a name.
    */
  def resolveString(spark: SparkSession, s: String): Option[String] = {
    if (s.contains("/")) return None
    val parts =
      try spark.sessionState.sqlParser.parseMultipartIdentifier(s)
      catch { case _: Exception => return None }
    resolve(spark, parts)
  }

  private def stripTicks(s: String): String = s.stripPrefix("`").stripSuffix("`")
}
