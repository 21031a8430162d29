package graft.core

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSimilarity, DotProduct, EuclideanDistance, MinHashSignatureExpr, ShinglesExpr, SimHash64Expr}

/** SparkSessionExtensions entry point: makes the graft custom expressions
  * available to pure-SQL users on any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.core.GraftExtensions")
  * }}}
  *
  * (the standard extension-injection path; [[graft.functions.VectorFunctions.register]]
  * does the same imperatively for an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.AnalysisException
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

    // the k/n/seed arguments are consumed at plan-build time, so they
    // must be foldable integers; anything else (a column, a string
    // literal) would otherwise surface as a raw ClassCastException/NPE
    // from eval() — raise the standard analyzer error instead
    def literalInt(fn: String, argName: String, arg: Expression): Int = {
      def fail(): Nothing = throw new AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr"   -> s""""$fn"""",
          "inputName" -> s"`$argName`",
          "inputType" -> "\"INT\"",
          "inputExpr" -> s""""${scala.util.Try(arg.sql).getOrElse(arg.toString)}""""))
      if (!arg.foldable) fail()
      arg.dataType match {
        case ByteType | ShortType | IntegerType =>
          arg.eval() match {
            case null      => fail()
            case v: Number => v.intValue()
          }
        case LongType =>
          arg.eval() match {
            case null => fail()
            case v: java.lang.Long =>
              if (v < Int.MinValue || v > Int.MaxValue) fail() else v.toInt
          }
        case _ => fail()
      }
    }

    // optimizer rule: length-band guard for levenshtein thresholds
    e.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)

    // pre-CBO (run-Once) rule: automatic stats-based file skipping for
    // filtered scans over lake table dirs — pruning runs a tiny stats
    // job, so it must not sit in the operator-optimization fixpoint
    e.injectPreCBORule(s => graft.plans.LakeSkippingRule(s))

    // SQL DML on lake tables: DELETE FROM / UPDATE / MERGE INTO targeting
    // graft_lake('<path>') translate to LakeTable.delete/update/merge;
    // everything else falls through to Spark's parser untouched
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))

    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("euclidean_dist"),
      info("euclidean_dist", "euclidean_dist(a, b) - L2 distance of two float/double arrays"),
      (es: Seq[Expression]) => EuclideanDistance(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      info("shingles", "shingles(tokens, n) - distinct n-token shingles"),
      (es: Seq[Expression]) =>
        ShinglesExpr(es.head, literalInt("shingles", "n", es(1)))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash signature"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(arr, k[, seed]) - k min-hashes"),
      (es: Seq[Expression]) => MinHashSignatureExpr(
        es.head,
        literalInt("minhash_signature", "k", es(1)),
        if (es.length > 2) literalInt("minhash_signature", "seed", es(2)) else 42)))
    // recursive trend smoothers as SQL functions — each expands to the
    // exact aggregate()-fold composition the DataFrame twins in
    // graft.analytics.Behavior run, so both spellings are bit-identical
    // by construction (graft.functions.Smoothers)
    e.injectFunction((
      FunctionIdentifier("ewma"),
      info("ewma",
        "ewma(vs, alpha) - exponentially-weighted moving average of a double array (oldest first), seeded with vs[1]"),
      (es: Seq[Expression]) => graft.functions.Smoothers.ewma(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("holt_smooth"),
      info("holt_smooth",
        "holt_smooth(vs, alpha, gamma) - Holt linear-trend smoothing; returns struct<level, trend>"),
      (es: Seq[Expression]) =>
        graft.functions.Smoothers.holtSmooth(es.head, es(1), es(2))))
    e.injectFunction((
      FunctionIdentifier("frequent_items"),
      info("frequent_items",
        "frequent_items(col, k) - Misra-Gries heavy hitters: array<struct<item,est>>"),
      (es: Seq[Expression]) => graft.functions.FrequentItems(
        es.head, literalInt("frequent_items", "k", es(1))).toAggregateExpression()))

    def literalString(fn: String, argName: String, arg: Expression): String = {
      def fail(): Nothing = throw new AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr"   -> s""""$fn"""",
          "inputName" -> s"`$argName`",
          "inputType" -> "\"STRING\"",
          "inputExpr" -> s""""${scala.util.Try(arg.sql).getOrElse(arg.toString)}""""))
      if (!arg.foldable ||
        arg.dataType != org.apache.spark.sql.types.StringType) fail()
      arg.eval() match {
        case null => fail()
        case v    => v.toString
      }
    }

    // TIMESTAMP AS OF arguments: a strict ISO-8601 instant string keeps
    // its historical exact semantics; anything else (date-only or
    // session-local timestamp strings, TIMESTAMP/DATE-typed expressions
    // like current_date() - INTERVAL 1 DAY) resolves through Spark's own
    // cast in the session time zone — Delta's contract.
    def literalInstant(fn: String, arg: Expression): java.time.Instant = {
      def fail(): Nothing = throw new AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr"   -> s""""$fn"""",
          "inputName" -> "`timestamp`",
          "inputType" -> "\"TIMESTAMP\"",
          "inputExpr" -> s""""${scala.util.Try(arg.sql).getOrElse(arg.toString)}""""))
      if (!arg.foldable) fail()
      def viaCast(e: Expression): java.time.Instant = {
        val tz = org.apache.spark.sql.SparkSession.active
          .sessionState.conf.sessionLocalTimeZone
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.TimestampType, Some(tz)).eval() match {
          case null => fail()
          case micros: java.lang.Long =>
            java.time.Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
          case _ => fail()
        }
      }
      arg.dataType match {
        case org.apache.spark.sql.types.StringType =>
          val s = literalString(fn, "timestamp", arg)
          try java.time.Instant.parse(s)
          catch { case _: java.time.format.DateTimeParseException => viaCast(arg) }
        case _ => viaCast(arg)
      }
    }

    // every lake TVF accepts a PATH or a REGISTERED NAME ('db.t' via
    // graft.sources.LakeNames) in its first argument — names keep the SQL
    // surface consistent with the reference's named-table idiom
    def lakePath(fn: String, arg: Expression): String = {
      val s = literalString(fn, "path", arg)
      graft.sources.LakeNames.resolveString(
        org.apache.spark.sql.SparkSession.active, s).getOrElse(s)
    }

    // inject into the session AND the static builtin registry: the lake
    // TVFs must count as BUILTIN functions so a persistent view can
    // reference them — CreateViewCommand rejects views over session-temp
    // functions, and graft.sources.LakeNames registers `db.name` as a
    // persistent view whose body is `SELECT * FROM graft_lake('<path>')`.
    // Idempotent: re-registration on each session build just replaces the
    // same builder.
    def injectLakeTvf(
        ident: FunctionIdentifier,
        inf: ExpressionInfo,
        builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
      e.injectTableFunction((ident, inf, builder))
      org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry.builtin
        .registerFunction(ident, inf, builder)
    }

    // SQL surface for the lake: FROM graft_lake('/path') reads a table
    // (either layout — a versioned path reads its latest snapshot),
    // graft_lake('/path', 3) is Delta's VERSION AS OF, and
    // graft_lake('/path', '2026-01-01T00:00:00Z') is TIMESTAMP AS OF —
    // a table-valued function resolved at analysis time to the table's
    // (already-analyzed) scan plan, so pushdown/pruning work as if the
    // DataFrame were used directly.
    injectLakeTvf(
      FunctionIdentifier("graft_lake"),
      info("graft_lake",
        "graft_lake(path|name[, version|timestamp]) - read a graft lake table, optionally time-traveled"),
      (es: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val path = lakePath("graft_lake", es.head)
        val df =
          if (es.length < 2) {
            if (graft.sources.VersionedLakeTable.isVersioned(spark, path))
              graft.sources.VersionedLakeTable(spark, path).read
            else graft.sources.LakeTable(spark, path).read
          } else es(1).dataType match {
            case org.apache.spark.sql.types.StringType |
                 org.apache.spark.sql.types.TimestampType |
                 org.apache.spark.sql.types.TimestampNTZType |
                 org.apache.spark.sql.types.DateType =>
              graft.sources.VersionedLakeTable(spark, path)
                .readAsOf(literalInstant("graft_lake", es(1)))
            case _ =>
              graft.sources.VersionedLakeTable(spark, path)
                .readVersion(literalInt("graft_lake", "version", es(1)).toLong)
          }
        df.queryExecution.analyzed
      })

    // DESCRIBE HISTORY as a query: FROM graft_history('/path') — the
    // commit log (version, operation, timestamp, operationParameters)
    // joins/filters like any table
    injectLakeTvf(
      FunctionIdentifier("graft_history"),
      info("graft_history", "graft_history(path) - commit history of a graft lake table"),
      (es: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sources.LakeTable(spark, lakePath("graft_history", es.head))
          .history.queryExecution.analyzed
      })

    // DESCRIBE DETAIL in SQL: graft_detail('/path') — one metadata row
    // (layout kind, file/byte counts, commit count, schema, constraints);
    // a driver-side listing, no data read
    injectLakeTvf(
      FunctionIdentifier("graft_detail"),
      info("graft_detail", "graft_detail(path) - table metadata: layout, files, bytes, commits, schema, constraints"),
      (es: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val path = lakePath("graft_detail", es.head)
        graft.sources.TableDetail.describe(spark, path).queryExecution.analyzed
      })

    // Delta table_changes in SQL: graft_changes('/path'[, from[, to]]).
    // Bounds are versions (integers) or timestamps (strings /
    // TIMESTAMP/DATE expressions), mirroring table_changes' two forms —
    // mixed int/timestamp bounds are rejected, like Delta.
    injectLakeTvf(
      FunctionIdentifier("graft_changes"),
      info("graft_changes",
        "graft_changes(path[, fromVersion|fromTimestamp[, toVersion|toTimestamp]]) - recorded change feed rows"),
      (es: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val path = lakePath("graft_changes", es.head)
        def isTimeArg(e: Expression): Boolean = e.dataType match {
          case org.apache.spark.sql.types.StringType |
               org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType |
               org.apache.spark.sql.types.DateType => true
          case _ => false
        }
        val t = graft.sources.LakeTable(spark, path)
        val df =
          if (es.length > 1 && isTimeArg(es(1))) {
            if (es.length > 2) {
              require(isTimeArg(es(2)),
                "graft_changes: bounds must both be versions or both timestamps")
              t.readChanges(literalInstant("graft_changes", es(1)),
                literalInstant("graft_changes", es(2)))
            } else t.readChanges(literalInstant("graft_changes", es(1)))
          } else {
            val from =
              if (es.length > 1) literalInt("graft_changes", "fromVersion", es(1)).toLong
              else 0L
            val to =
              if (es.length > 2) {
                require(!isTimeArg(es(2)),
                  "graft_changes: bounds must both be versions or both timestamps")
                literalInt("graft_changes", "toVersion", es(2)).toLong
              } else Long.MaxValue
            t.readChanges(from, to)
          }
        df.queryExecution.analyzed
      })

    // a foldable numeric-array literal (the ANN TVF's query vector),
    // materialized as floats to match the stored embedding element type
    // exactly — serving must score the same bits the index holds
    def literalFloatArray(fn: String, arg: Expression): Array[Float] = {
      def fail(): Nothing = throw new AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr"   -> s""""$fn"""",
          "inputName" -> "`vector`",
          "inputType" -> "\"ARRAY<FLOAT>\"",
          "inputExpr" -> s""""${scala.util.Try(arg.sql).getOrElse(arg.toString)}""""))
      if (!arg.foldable) fail()
      val elem = arg.dataType match {
        case org.apache.spark.sql.types.ArrayType(et, _) => et
        case _ => fail()
      }
      arg.eval() match {
        case null => fail()
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          import org.apache.spark.sql.types._
          elem match {
            case FloatType   => a.toFloatArray()
            case DoubleType  => a.toDoubleArray().map(_.toFloat)
            case IntegerType => a.toIntArray().map(_.toFloat)
            case LongType    => a.toLongArray().map(_.toFloat)
            case _: DecimalType =>
              (0 until a.numElements()).map(i =>
                a.get(i, elem).asInstanceOf[org.apache.spark.sql.types.Decimal]
                  .toFloat).toArray
            case _ => fail()
          }
        case _ => fail()
      }
    }

    // SQL serving for the STANDING retrieval indexes — the last piece of
    // the "a SQL user reaches everything" contract: a point query against
    // an index another job built, no DataFrame code required. Both TVFs
    // go through the library serve paths, so the freshness guard
    // (IndexMeta.requireFresh) and file-level pruning apply unchanged.
    //   FROM graft_bm25_topk('/idx', 'free text query', 5)
    //   FROM graft_ann_topk('/idx', array(0.1F, ...), 5[, nProbe])
    injectLakeTvf(
      FunctionIdentifier("graft_bm25_topk"),
      info("graft_bm25_topk",
        "graft_bm25_topk(indexDir, query, k) - top-k docs by BM25 from a standing inverted index"),
      (es: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val dir = lakePath("graft_bm25_topk", es.head)
        val text = literalString("graft_bm25_topk", "query", es(1))
        val k = literalInt("graft_bm25_topk", "k", es(2))
        // the index tokenizer's exact semantics (TextFunctions.tokens):
        // trim + lowercase + whitespace split
        val terms = text.trim.toLowerCase.split("\\s+").toSeq
          .filter(_.nonEmpty).distinct
        require(terms.nonEmpty, "graft_bm25_topk: query has no terms")
        // terms are SQL literals the driver already holds — the Seq
        // overload skips the collect-the-workload-back Spark job
        graft.text.InvertedIndex
          .serveBm25(spark, dir, terms.map((0L, _)), k,
            k1 = graft.text.InvertedIndex.DefaultK1,
            b = graft.text.InvertedIndex.DefaultB)
          .select("rank", "doc_id", "score")
          .queryExecution.analyzed
      })
    injectLakeTvf(
      FunctionIdentifier("graft_ann_topk"),
      info("graft_ann_topk",
        "graft_ann_topk(indexDir, vector, k[, nProbe]) - top-k cosine neighbors from a standing IVF index"),
      (es: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val dir = lakePath("graft_ann_topk", es.head)
        val vec = literalFloatArray("graft_ann_topk", es(1))
        val k = literalInt("graft_ann_topk", "k", es(2))
        val nProbe =
          if (es.length > 3) literalInt("graft_ann_topk", "nProbe", es(3)) else 4
        import spark.implicits._
        // sentinel query id: serveTopK excludes self-matches by id
        // equality, and -1 can never collide with a stored vector id
        graft.text.IvfIndex
          .serveTopK(spark, dir, Seq((-1L, vec)).toDF("vec_id", "embedding"),
            "vec_id", "embedding", k, nProbe)
          .select("rank", "vec_id", "cos")
          .queryExecution.analyzed
      })
  }
}
