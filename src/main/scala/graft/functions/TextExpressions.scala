package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom per-row text expressions for the dedup pipelines.
  *
  * Why expressions and not `transform`/`aggregate` built-ins: higher-order
  * built-ins re-evaluate captured argument expressions once per ELEMENT
  * (and CollapseProject re-inlines any projection boundary), so a
  * shingling pipeline written with lambdas re-runs the upstream regex
  * split per shingle — measured 25s on 5,000 docs. These expressions
  * evaluate their input array exactly once per row and do the loop in
  * plain JVM code (sub-second for the same input). CodegenFallback is fine
  * here: the per-row work dominates, not expression dispatch.
  */
abstract class TokensUnaryExpression extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<string>, got $other")
    }
}

/** Distinct n-token shingles (first-occurrence order) of a token array. */
case class ShinglesExpr(child: Expression, n: Int) extends TokensUnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= m - n) {
        val sb = new StringBuilder
        var j = 0
        var hasNull = false
        while (j < n) {
          val t = toks.getUTF8String(i + j)
          // positional separator (j>0, not sb.nonEmpty): empty-string
          // tokens keep their slot, so ["a","","b"] and ["","a","b"]
          // yield distinct shingles — matching array_to_string semantics
          if (j > 0) sb.append(' ')
          if (t == null) hasNull = true
          else sb.append(t.toString)
          j += 1
        }
        // windows containing a NULL token are skipped (the array type
        // admits containsNull=true and this is SQL-exposed)
        if (!hasNull) seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit SimHash of a token array: per-token XXH64, bit-vote, sign. */
case class SimHash64Expr(child: Expression) extends TokensUnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val m = toks.numElements()
    while (i < m) {
      val t = toks.getUTF8String(i)
      if (t != null) { // null tokens cast no vote
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes2(t.getBaseObject, t.getBaseOffset, t.numBytes, 42)
        // widen 32-bit murmur to 64 bits with a second seed
        val h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes2(t.getBaseObject, t.getBaseOffset, t.numBytes, 1299709)
        val h64 = (h.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
        var b = 0
        while (b < 64) {
          if (((h64 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 60-bit md5 SimHash of a token array — the ENGINE-NEUTRAL signature
  * the q_simhash_neardup oracle recomputes in DuckDB: per token,
  * `conv(substr(md5(t), 1, 15), 16, 10)` (= the digest's top 60 bits),
  * bit-vote over 60 positions, sign bitmap with `votes > 0` set. This
  * expression IS that HOF arithmetic compiled: the nested
  * transform/aggregate/zip_with spelling evaluates ~60 lambda frames
  * per token interpreted (measured 8 s on the sf0.1 bench — 12x the
  * murmur path); one fused pass brings it back. Null tokens cast no
  * vote (the HOF's `if` votes -1 on a null hash, but tokens() can
  * never produce null elements, so the two spellings agree on every
  * reachable input — equality pinned in DedupSpec).
  */
case class SimHash60Md5Expr(child: Expression) extends TokensUnaryExpression {
  override def dataType: DataType = LongType

  // MessageDigest is stateful and not thread-safe; one per task thread
  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    val d = md5.get()
    var i = 0
    val m = toks.numElements()
    while (i < m) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        d.reset()
        val dig = d.digest(t.getBytes)
        // first 15 hex chars == big-endian first 8 bytes >>> 4
        var h64 = 0L
        var k = 0
        while (k < 8) { h64 = (h64 << 8) | (dig(k) & 0xFFL); k += 1 }
        val h = h64 >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature: k independent min-hashes of a string array, one pass
  * over the array per row (k seeds, not k array traversals of a lambda).
  */
case class MinHashSignatureExpr(child: Expression, k: Int, seed: Int)
    extends TokensUnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val seeds: Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)(rnd.nextInt())
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val m = toks.numElements()
    while (i < m) {
      val t = toks.getUTF8String(i)
      var s = 0
      while (t != null && s < k) { // null elements don't contribute
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes2(t.getBaseObject, t.getBaseOffset, t.numBytes, seeds(s))
        val h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes2(t.getBaseObject, t.getBaseOffset, t.numBytes, seeds(s) ^ 0x5bd1e995)
        val h64 = (h.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
        if (h64 < mins(s)) mins(s) = h64
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** First occurrence of each token, original order preserved — the C4-style
  * in-document repetition drop as ONE pass per row (LinkedHashSet), so the
  * whole transform is map-only: no (doc, token) shuffle, no per-group
  * collect. Null tokens are dropped (they can't round-trip through the
  * rebuilt text).
  */
/** BPE tokenization of a word (token) array against a trained rank map —
  * the production-vocabulary path behind [[graft.text.Bpe.encodeScalable]]:
  * the plan holds ONE expression however many merge rules exist (the
  * per-rule fold composition in `Bpe.encode` grows the expression tree —
  * and Catalyst analysis with it — linearly in rules). Per word, the
  * HuggingFace-style loop fuses the LOWEST-RANK adjacent pair present,
  * all occurrences left to right, until no rule applies; for rules
  * learned by `Bpe.learnMerges` (each rule's sides created by lower
  * ranks) this reproduces the per-rank folds exactly (PropertySpec).
  *
  * The rank map rides the serialized expression (~25 B/rule); at 32k
  * rules that is ~1 MB per plan — fine for a per-job tokenizer.
  */
case class BpeEncodeExpr(child: Expression, ranks: Map[(String, String), Int])
    extends TokensUnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    val n = words.numElements()
    while (w < n) {
      val word = words.getUTF8String(w)
      if (word != null && word.numChars() > 0) {
        // CODE-POINT split, not code units: a surrogate pair (emoji,
        // supplementary CJK) must stay one symbol, matching the
        // code-point-aware split("") the fold path starts from
        var syms = {
          val s = word.toString
          val cps = scala.collection.mutable.ArrayBuffer.empty[String]
          var ci = 0
          while (ci < s.length) {
            val cp = s.codePointAt(ci)
            cps += new String(Character.toChars(cp))
            ci += Character.charCount(cp)
          }
          cps.toArray
        }
        var done = syms.length < 2
        while (!done) {
          var best = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < best) best = r
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 &&
                ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
                merged += syms(j) + syms(j + 1)
                j += 2
              } else {
                merged += syms(j)
                j += 1
              }
            }
            syms = merged.toArray
            done = syms.length < 2
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

case class FirstOccurrenceTokensExpr(child: Expression) extends TokensUnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val m = toks.numElements()
    while (i < m) {
      val t = toks.getUTF8String(i)
      // clone: the returned array outlives this eval, and getUTF8String
      // may point into a reused row buffer
      if (t != null) seen.add(t.clone())
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Unicode hygiene — the FIRST normalization pass of every corpus
  * pipeline: NFC composition (so `e` + U+0301 and precomposed `é` dedupe,
  * fingerprint, and tokenize identically) followed by a strip of the
  * C0/DEL/C1 control ranges except tab/newline/CR (PDF extractions and
  * mojibake leave them everywhere; they poison shingles and models).
  * One codegen call into [[TextNormalizeExpr.clean]] per row — the JDK's
  * own `java.text.Normalizer` does NFC, matching DuckDB's utf8proc
  * implementation of the same Unicode standard, which is what makes the
  * operator oracle-checkable byte-for-byte.
  */
case class TextNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize expects string, got $other")
    }
  override def nullSafeEval(s: Any): Any =
    TextNormalizeExpr.clean(s.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalizeExpr.clean($c)")
  override protected def withNewChildInternal(c: Expression): TextNormalizeExpr =
    copy(child = c)
}

object TextNormalizeExpr {
  def clean(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      val control =
        (c < ' ' && c != '\t' && c != '\n' && c != '\r') ||
          (c >= '\u007F' && c <= '\u009F')
      if (!control) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object TextExpressions {
  def normalizeText(text: Column): Column =
    GraftBridge.column(TextNormalizeExpr(GraftBridge.expression(text)))

  def shingles(tokens: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(tokens), n))

  def firstOccurrenceTokens(tokens: Column): Column =
    GraftBridge.column(FirstOccurrenceTokensExpr(GraftBridge.expression(tokens)))

  def bpeEncode(tokens: Column, ranks: Map[(String, String), Int]): Column =
    GraftBridge.column(BpeEncodeExpr(GraftBridge.expression(tokens), ranks))

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(tokens)))

  def simhash60Md5(tokens: Column): Column =
    GraftBridge.column(SimHash60Md5Expr(GraftBridge.expression(tokens)))

  def minhashSignature(arr: Column, k: Int, seed: Int = 42): Column =
    GraftBridge.column(MinHashSignatureExpr(GraftBridge.expression(arr), k, seed))
}
