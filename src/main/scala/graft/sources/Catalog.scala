package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-catalog DDL over lake locations (SURVEY §2 A4/A5/A6).
  *
  * Reference shape: `CREATE DATABASE IF NOT EXISTS rwd_hls ... LOCATION`
  * and `CREATE TABLE ... USING DELTA LOCATION` (00-etl-rwd.py:151-200),
  * re-expressed as `USING PARQUET` external tables so `spark.sql` /
  * `spark.table` resolve them through the normal Catalyst analyzer path.
  */
object Catalog {

  /** Location paths pass through TWO escape-interpreting layers before
    * reaching the filesystem, and both treat backslash specially:
    *
    *   1. Spark's SQL lexer: `\` escapes inside string literals, so a
    *      path ending in `\` (or containing `\'`) would swallow the
    *      closing quote — double `\` and `'`;
    *   2. Hadoop's glob resolver (CREATE TABLE LOCATION is globbed): `\`
    *      escapes the next char, so a literal backslash must arrive as
    *      `\\` — double it once more BEFORE the SQL escaping.
    *
    * Net: each literal `\` becomes `\\\\` in the spliced literal; `'`
    * becomes `''`. Other glob metachars (`*?[]`) are left alone — they
    * are legal in legit glob locations and cannot terminate the literal.
    */
  private def sqlQuote(path: String): String =
    path.replace("\\", "\\\\\\\\").replace("'", "''")

  def createDatabase(spark: SparkSession, name: String, location: Option[String] = None): Unit = {
    val loc = location.map(l => s" LOCATION '${sqlQuote(l)}'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`$loc")
  }

  /** Register an external parquet table over an existing location. */
  def registerTable(spark: SparkSession, db: String, table: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    spark.sql(s"CREATE TABLE `$db`.`$table` USING PARQUET LOCATION '${sqlQuote(path)}'")
  }

  /** Register every parquet table in a scale-factor dir as `db`.`name`. */
  def registerTestdata(spark: SparkSession, db: String, sfDir: String): Unit = {
    createDatabase(spark, db)
    val dir = new java.io.File(sfDir)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      registerTable(spark, db, f.getName.stripSuffix(".parquet"), f.getAbsolutePath)
    }
  }

  def select(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  def dropDatabase(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$name` CASCADE")
}
