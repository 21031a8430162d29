package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling curve index (Skilling's transpose algorithm,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — public
  * domain and the construction behind Databricks liquid clustering's
  * curve). Compared to the Morton/Z-order interleave ([[graft.sources.ZOrder]]),
  * consecutive Hilbert indices are ALWAYS grid-adjacent (Manhattan
  * distance 1), so a sorted file span covers a compact tile with no
  * Z-shape diagonal jumps — tighter per-file min/max bounding boxes and
  * therefore better multi-column skipping at the same file count.
  *
  * `index` maps n coordinates of `bits` bits each onto a single
  * n*bits-bit curve position (a bijection on the grid); the expression
  * wrapper evaluates it row-at-a-time inside whole-stage codegen.
  */
object Hilbert {

  /** Hilbert curve position of grid cell `xs` (each in [0, 2^bits)).
    * Requires xs.length * bits <= 63 so the result fits a long.
    */
  def index(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    val x = xs.clone()
    // Skilling's AxesToTranspose: undo excess rotation/reflection from
    // the highest bit plane down, then Gray-encode across dimensions.
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose -> scalar: bit b of x(j) lands so that (x(0), bit bits-1)
    // is the most significant position
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) { h = (h << 1) | ((x(j) >> b) & 1L); j += 1 }
      b -= 1
    }
    h
  }

  /** Column API over non-negative long rank columns. */
  def hilbertIndex(cols: Seq[Column], bits: Int): Column =
    GraftBridge.column(HilbertIndexExpr(cols.map(GraftBridge.expression), bits))
}

/** N-ary codegen expression: long ranks -> Hilbert index. NULL in any
  * input yields NULL (callers clustering on nullable columns coalesce
  * ranks to 0 first, same as the Z-order path).
  */
case class HilbertIndexExpr(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.nonEmpty && children.length * bits <= 63,
    s"${children.length} cols x $bits bits exceeds a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var i = 0
    while (i < xs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    Hilbert.index(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("hilbertXs")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }
         |else { $xs[$i] = ${e.value}; }""".stripMargin
    }.mkString("\n")
    // Hilbert$.MODULE$ is the Scala object's JVM singleton — callable
    // from generated Java without reflection
    val mod = "graft.functions.Hilbert$.MODULE$"
    ev.copy(code = code"""
      |boolean ${ev.isNull} = false;
      |long ${ev.value} = ${CodeGenerator.defaultValue(LongType)};
      |long[] $xs = new long[${children.length}];
      |$fills
      |if (!${ev.isNull}) {
      |  ${ev.value} = $mod.index($xs, $bits);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
