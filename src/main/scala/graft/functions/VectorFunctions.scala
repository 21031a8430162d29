package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY §2 M3).
  *
  * A Scala UDF over Array[Float] would deserialize each array to
  * `WrappedArray` per row; these expressions read the columnar
  * `ArrayData` buffers directly and participate in whole-stage codegen —
  * the preference order the north star mandates (built-in > Expression >
  * UDF). Accumulation is sequential in Double, matching the DuckDB
  * oracle's `list_cosine_similarity(::DOUBLE[])` bit-for-bit.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  @inline protected final def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** True if either vector has a null slot — the whole result must be NULL
    * (SQL null propagation). ArrayData.getDouble on a null slot silently
    * reads 0.0, so skipping this check would yield a wrong number, not an
    * error.
    */
  @inline protected final def anyNullSlot(a: ArrayData, b: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  protected def getterCode(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** dot(a, b): sequential double accumulation; null if lengths differ. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() || anyNullSlot(a, b)) null
    else {
      val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
      var dot = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) { dot += get(a, i, fa) * get(b, i, fb); i += 1 }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ${getterCode(a, i, elemIsFloat(left))} *
         |            ${getterCode(b, i, elemIsFloat(right))};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (||a|| * ||b||); null on length mismatch or a
  * zero-norm side.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() || anyNullSlot(a, b)) null
    else {
      val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        val x = get(a, i, fa)
        val y = get(b, i, fb)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${getterCode(a, i, elemIsFloat(left))};
         |    double $y = ${getterCode(b, i, elemIsFloat(right))};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance; null on length mismatch or a null slot. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() || anyNullSlot(a, b)) null
    else {
      val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        val d = get(a, i, fa) - get(b, i, fb)
        acc += d * d
        i += 1
      }
      math.sqrt(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${getterCode(a, i, elemIsFloat(left))} -
         |                ${getterCode(b, i, elemIsFloat(right))};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = java.lang.Math.sqrt($acc);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** dot product as a Column. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** cosine similarity as a Column. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = {
    val d = dot(a, a)
    org.apache.spark.sql.functions.sqrt(d)
  }

  /** Euclidean distance as a Column. */
  def euclidean(a: Column, b: Column): Column =
    GraftBridge.column(
      EuclideanDistance(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register cosine_sim / dot_product / euclidean_dist for SQL callers. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "cosine_sim",
      es => CosineSimilarity(es.head, es(1)))
    GraftBridge.registerFunction(spark, "dot_product",
      es => DotProduct(es.head, es(1)))
    GraftBridge.registerFunction(spark, "euclidean_dist",
      es => EuclideanDistance(es.head, es(1)))
  }
}
