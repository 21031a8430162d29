package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeidentifySpec extends SparkSpec {
  import spark.implicits._

  private def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sha1 matches java.security reference and is 40 lowercase hex chars") {
    val df = Seq("alice", "bob", "").toDF("v")
      .select(Deidentify.hashCol(col("v")).as("h"), col("v"))
    df.collect().foreach { r =>
      val h = r.getString(0)
      assert(h === sha1Hex(r.getString(1)))
      assert(h.matches("[0-9a-f]{40}"))
    }
  }

  test("NULL hashes to sha1(\"null\") — reference 00-etl-rwd.py:79 semantics") {
    val df = Seq[Option[String]](None).toDF("v")
      .select(Deidentify.hashCol(col("v")).as("h"))
    assert(df.head.getString(0) === sha1Hex("null"))
  }

  test("deterministic across invocations") {
    val d1 = Seq("x").toDF("v").select(Deidentify.hashCol(col("v"))).head.getString(0)
    val d2 = Seq("x").toDF("v").select(Deidentify.hashCol(col("v"))).head.getString(0)
    assert(d1 === d2)
  }

  test("non-string PII columns are stringified before hashing") {
    val df = Seq(42).toDF("v").select(Deidentify.hashCol(col("v")).as("h"))
    assert(df.head.getString(0) === sha1Hex("42"))
  }
}
