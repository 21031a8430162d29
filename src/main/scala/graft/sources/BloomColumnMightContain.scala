package graft.sources

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a NON-constant bloom column: Spark's own
  * `BloomFilterMightContain` requires a constant/scalar-subquery bloom
  * (it deserializes once and caches), which rules out probing the
  * per-file bloom blobs stored in a stats table. This expression
  * deserializes per ROW instead — each stats row carries a different
  * file's filter, so there is nothing to cache anyway, and the input is
  * one row per data FILE, never per data row.
  *
  * `left` = serialized `org.apache.spark.util.sketch.BloomFilter` bytes
  * (as [[FileStats.bloomAgg]] stores), `right` = the xxhash64-hashed
  * probe value (long), mirroring the insert side's pre-hash.
  */
final case class BloomColumnMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(bloomBytes: Any, hash: Any): Any =
    BloomColumnMightContain.probe(
      bloomBytes.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bloom, hash) =>
      s"graft.sources.BloomColumnMightContain.probe($bloom, $hash)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomColumnMightContain {

  /** Static probe for both codegen and interpreted paths. */
  def probe(bloomBytes: Array[Byte], hash: Long): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes)).mightContainLong(hash)

  /** Probe MANY hashes against one blob with a single deserialization —
    * the IN-list path: per-literal [[probe]] calls would re-read the
    * ~bloomNumBits/8-byte filter once per (stats row x literal), which a
    * 256-key CDC batch against thousands of statted files turns into
    * gigabytes of buffer copying during the prune step.
    */
  def probeAny(bloomBytes: Array[Byte],
      hashes: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
    var i = 0
    while (i < hashes.numElements()) {
      if (bf.mightContainLong(hashes.getLong(i))) return true
      i += 1
    }
    false
  }
}

/** True iff the bloom blob might contain ANY of the hashed probe values
  * (`right` = array<long> of xxhash64 pre-hashes). One deserialization
  * per stats row regardless of the IN-list width — see
  * [[BloomColumnMightContain.probeAny]].
  */
final case class BloomColumnMightContainAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain_any"

  override protected def nullSafeEval(bloomBytes: Any, hashes: Any): Any =
    BloomColumnMightContain.probeAny(
      bloomBytes.asInstanceOf[Array[Byte]],
      hashes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bloom, hashes) =>
      s"graft.sources.BloomColumnMightContain.probeAny($bloom, $hashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
