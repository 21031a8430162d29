package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {

  test("hyperplane buckets: dimension mismatch yields NULL like dot, not truncation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val planes: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(1.0, 1.0))) // dim 2
    val df = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f, 1.0f)))
      .toDF("id", "v")
      .select(col("id"),
        graft.functions.VectorFunctions.hyperplaneBuckets(col("v"), planes).as("b"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Long](1) === Seq(1L)) // dot = 2 >= 0 -> bit 0
    assert(rows(1).isNullAt(1), "3-dim vector vs 2-dim planes must be NULL")
  }
  import spark.implicits._

  private val eps = 1e-12

  test("cosine matches scala reference on float arrays") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(got - expected) < eps)
  }

  test("dot on double arrays, and identity cosine == 1") {
    val got = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got === 11.0)
    val self = Seq((Array(0.3f, -0.7f), Array(0.3f, -0.7f))).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
  }

  test("length mismatch and zero vector yield null") {
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head
    assert(mismatch.isNullAt(0))
    val zero = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head
    assert(zero.isNullAt(0))
  }

  test("interpreted and codegen paths agree") {
    val df = Seq((Array(1.5f, -2.5f, 0.25f), Array(4.0f, 1.0f, -3.0f))).toDF("a", "b")
    val withCodegen = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
      assert(withCodegen === interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("text expressions tolerate NULL array elements (SQL-exposed surface)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Seq[String]("a", null, "b", "c")).toDF("arr")
    val shingles = df.select(
      graft.functions.TextExpressions.shingles(col("arr"), 2)).head.getSeq[String](0)
    assert(shingles === Seq("b c"), s"null-window shingles must be skipped: $shingles")
    val sh = df.select(graft.functions.TextExpressions.simhash64(col("arr"))).head.getLong(0)
    val shNoNull = Seq(Seq("a", "b", "c")).toDF("arr")
      .select(graft.functions.TextExpressions.simhash64(col("arr"))).head.getLong(0)
    assert(sh === shNoNull, "null tokens must cast no simhash vote")
    val mh = df.select(graft.functions.TextExpressions.minhashSignature(col("arr"), 4))
      .head.getSeq[Long](0)
    assert(mh.length === 4)
  }

  test("a null array slot yields NULL, in codegen and interpreted paths") {
    VectorFunctions.register(spark)
    // ArrayData.getDouble on a null slot silently reads 0.0 — the
    // expressions must return NULL instead of a silently-wrong number
    val q = "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) c," +
      " dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) d"
    val codegen = spark.sql(q).head
    assert(codegen.isNullAt(0) && codegen.isNullAt(1), s"codegen: $codegen")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = spark.sql(q).head
      assert(interp.isNullAt(0) && interp.isNullAt(1), s"interpreted: $interp")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0D,0.0D), array(1.0D,0.0D)) c," +
      " dot_product(array(2.0D,3.0D), array(4.0D,5.0D)) d," +
      " euclidean_dist(array(0.0D,0.0D), array(3.0D,4.0D)) e").head
    assert(math.abs(r.getDouble(0) - 1.0) < eps)
    assert(r.getDouble(1) === 23.0)
    assert(math.abs(r.getDouble(2) - 5.0) < eps) // 3-4-5 triangle
  }

  test("euclidean: identity is zero, mismatch and null slot are NULL") {
    val zero = Seq((Array(1.5f, -2.0f), Array(1.5f, -2.0f))).toDF("a", "b")
      .select(VectorFunctions.euclidean(col("a"), col("b"))).head.getDouble(0)
    assert(zero === 0.0)
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.euclidean(col("a"), col("b"))).head
    assert(mismatch.isNullAt(0))
    VectorFunctions.register(spark)
    val nullSlot = spark.sql(
      "SELECT euclidean_dist(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))").head
    assert(nullSlot.isNullAt(0))
  }
}
