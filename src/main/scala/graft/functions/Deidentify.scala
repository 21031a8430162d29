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

  /** DuckDB-1.0.0 content oracle for q_deid_sha1: SHA-1 itself, written in
    * SQL (FIPS 180-4 §6.1). The harness's DuckDB predates the `sha1()`
    * built-in (added in 1.1), so the oracle computes the digest from first
    * principles: a recursive CTE carries the five working variables through
    * the 80 compression rounds as 32-bit values in BIGINT arithmetic
    * (masked `& 0xffffffff`; a round's intermediates peak below 2^38, far
    * inside BIGINT), with the message schedule grown lazily via
    * `list_append` from round 16 on. At sf0.01 that is 1500 rows x 81
    * recursion steps — trivial for the oracle side, and the engine side
    * stays the codegen'd built-in.
    *
    * Scope guards (checked against the actual corpus; a refusal degrades
    * the query to rows-only, its pre-promotion state, via the
    * [[graft.SparkEntry.dynamicOracleSql]] tryOracle wrapper):
    *  - ASCII-only input: the SQL reads bytes as `unicode(substr(m,k,1))`,
    *    i.e. code points, which equal UTF-8 bytes only below 0x80. The
    *    engine hashes UTF-8 bytes, so any non-ASCII name would diverge.
    *  - Single 512-bit block: padding is inlined for byte length <= 55
    *    (one block holds data + 0x80 + the 64-bit length). TPC-H names
    *    ("Customer#" + 9 digits = 18 bytes) fit with room to spare.
    */
  def sha1OracleSql(spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val names = graft.core.Tables(spark, sfDir).customer
      .select(coalesce(col("c_name").cast("string"), lit("null")).as("m"))
    val bad = names
      .where(octet_length(col("m")) > 55 ||
        octet_length(col("m")) =!= length(col("m")))
      .limit(1).count()
    require(bad == 0L,
      "sha1 oracle scope: c_name must be ASCII and <= 55 bytes (single block)")
    // Masks/rotations: rotl(x,s) = ((x * 2^s) & 0xffffffff) | (x >> (32-s)).
    // The schedule list stays 1-indexed: w[t+1] is word t; appends start at
    // round 16 so indices t-2/t-7/t-13/t-15 are exactly w[t-3]/w[t-8]/
    // w[t-14]/w[t-16] zero-based.
    """WITH RECURSIVE
      |msg AS (
      |  SELECT c_custkey, coalesce(c_name, 'null') AS m,
      |         length(coalesce(c_name, 'null'))::BIGINT AS n
      |  FROM customer
      |),
      |bytes AS (
      |  SELECT c_custkey,
      |    list_transform(range(0, 64), k ->
      |      CASE WHEN k < n THEN unicode(substr(m, (k + 1)::INT, 1))::BIGINT
      |           WHEN k = n THEN 128
      |           WHEN k = 62 THEN (8 * n) // 256
      |           WHEN k = 63 THEN (8 * n) % 256
      |           ELSE 0 END) AS b
      |  FROM msg
      |),
      |words AS (
      |  SELECT c_custkey,
      |    list_transform(range(0, 16), j ->
      |      b[(4 * j + 1)::INT] * 16777216 + b[(4 * j + 2)::INT] * 65536
      |        + b[(4 * j + 3)::INT] * 256 + b[(4 * j + 4)::INT]) AS w
      |  FROM bytes
      |),
      |rounds AS (
      |  SELECT c_custkey, 0::BIGINT AS t,
      |         1732584193::BIGINT AS ra, 4023233417::BIGINT AS rb,
      |         2562383102::BIGINT AS rc, 271733878::BIGINT AS rd,
      |         3285377520::BIGINT AS re, w
      |  FROM words
      |  UNION ALL
      |  SELECT c_custkey, t + 1,
      |         (((((ra * 32) & 4294967295) | (ra >> 27)) + f + re + k + wt)
      |           & 4294967295) AS ra2,
      |         ra AS rb2,
      |         (((rb * 1073741824) & 4294967295) | (rb >> 2)) AS rc2,
      |         rc AS rd2,
      |         rd AS re2,
      |         CASE WHEN t < 16 THEN w ELSE list_append(w, wt) END AS w2
      |  FROM (
      |    SELECT c_custkey, t, ra, rb, rc, rd, re, w,
      |      CASE WHEN t < 16 THEN w[(t + 1)::INT]
      |           ELSE ((xor(xor(w[(t - 2)::INT], w[(t - 7)::INT]),
      |                      xor(w[(t - 13)::INT], w[(t - 15)::INT])) * 2) & 4294967295)
      |              | (xor(xor(w[(t - 2)::INT], w[(t - 7)::INT]),
      |                     xor(w[(t - 13)::INT], w[(t - 15)::INT])) >> 31)
      |      END AS wt,
      |      CASE WHEN t < 20 THEN (rb & rc) | (xor(rb, 4294967295) & rd)
      |           WHEN t < 40 THEN xor(xor(rb, rc), rd)
      |           WHEN t < 60 THEN (rb & rc) | (rb & rd) | (rc & rd)
      |           ELSE xor(xor(rb, rc), rd) END AS f,
      |      CASE WHEN t < 20 THEN 1518500249::BIGINT
      |           WHEN t < 40 THEN 1859775393::BIGINT
      |           WHEN t < 60 THEN 2400959708::BIGINT
      |           ELSE 3395469782::BIGINT END AS k
      |    FROM rounds WHERE t < 80
      |  )
      |)
      |SELECT c_custkey,
      |  lower(lpad(to_hex((1732584193 + ra) & 4294967295), 8, '0')
      |     || lpad(to_hex((4023233417 + rb) & 4294967295), 8, '0')
      |     || lpad(to_hex((2562383102 + rc) & 4294967295), 8, '0')
      |     || lpad(to_hex((271733878 + rd) & 4294967295), 8, '0')
      |     || lpad(to_hex((3285377520 + re) & 4294967295), 8, '0')) AS name_sha1
      |FROM rounds WHERE t = 80
      |ORDER BY c_custkey""".stripMargin
  }
}
