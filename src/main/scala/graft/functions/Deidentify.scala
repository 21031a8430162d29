package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII de-identification (SURVEY §2 B16).
  *
  * The reference hashes 10 PII columns with a *Python UDF*
  * `hashlib.sha1(coalesce(col,'null'))` (00-etl-rwd.py:62-79) — every row
  * round-trips JVM -> forked Python worker -> JVM. Here the same semantics
  * are one codegen'd built-in expression, `sha1(coalesce(c, 'null'))`,
  * executed inside whole-stage codegen: no serialization boundary at all.
  *
  * Deliberately preserved reference quirk (SURVEY §7.5.3): a NULL value is
  * replaced by the literal string "null" BEFORE hashing, so NULLs hash to
  * sha1("null") = 52b7764...a9ed50 rather than staying NULL.
  */
object Deidentify {

  /** sha1 of the value with the reference's NULL->"null" convention. */
  def hashCol(c: Column): Column = sha1(coalesce(c.cast("string"), lit("null")))

  /** Hash each named column in place. */
  def apply(df: DataFrame, piiCols: Seq[String]): DataFrame =
    piiCols.foldLeft(df)((d, name) => d.withColumn(name, hashCol(col(name))))
}
