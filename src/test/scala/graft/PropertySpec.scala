package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Deidentify
import graft.text.{Dedup, TextFunctions}

/** Property-based invariants (SURVEY §5.2) using raw ScalaCheck generators
  * sampled with fixed seeds (the scalatest-scalacheck bridge artifact is
  * not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOfN(12, word).map(_.mkString(" "))

  /** Deterministic sample stream from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("sha1 de-id: 40 lowercase hex, deterministic, injective on samples") {
    samples(Gen.listOfN(8, word), 10).filter(_.nonEmpty).foreach { ws =>
      val out = ws.distinct.toDF("v")
        .select(Deidentify.hashCol(col("v")).as("h"), col("v"))
        .collect().map(r => r.getString(1) -> r.getString(0)).toMap
      assert(out.values.forall(_.matches("[0-9a-f]{40}")))
      assert(out.keySet.size === out.values.toSet.size)
    }
  }

  test("count-min estimates never undercount on random streams (one-sided guarantee)") {
    import graft.functions.CountMinSketch
    samples(Gen.listOfN(300, Gen.choose(0, 40).map(i => s"k$i")), 8)
      .filter(_.nonEmpty).foreach { stream =>
        val sk = stream.toDF("k")
          .agg(CountMinSketch.agg(col("k"), depth = 4, width = 256).as("sk"))
          .head.getAs[Array[Byte]](0)
        val slack = math.ceil(stream.size * 8.0 / 256).toLong
        stream.groupBy(identity).foreach { case (k, ks) =>
          val est = CountMinSketch.estimate(
            sk, org.apache.spark.unsafe.types.UTF8String.fromString(k))
          assert(est >= ks.size.toLong, s"$k undercounted")
          assert(est <= ks.size.toLong + slack, s"$k overcounted past 8N/w")
        }
      }
  }

  test("weighted sample: the drawn set is stable under shuffling and duplication of partitions") {
    import graft.operators.Sampling
    samples(Gen.listOfN(60, Gen.choose(1, 100)), 6).foreach { ws =>
      val rows = ws.zipWithIndex.map { case (w, i) => (i.toLong, w.toDouble) }
      val df = rows.toDF("id", "w")
      val base = Sampling.weightedSample(df, "id", "w", k = 20)
        .select("id").as[Long].collect().toSet
      val reparted = Sampling.weightedSample(df.repartition(7), "id", "w", k = 20)
        .select("id").as[Long].collect().toSet
      assert(base === reparted, s"sample drifted under repartition for $rows")
      assert(base.size === math.min(20, rows.size))
    }
  }

  test("text normalization is idempotent and never grows the string") {
    import graft.functions.TextExpressions
    val noisy = Gen.listOfN(10, Gen.oneOf(
      "plain", "e\u0301", "\u00e9", "a\u0007b", "x\ty", "c\u0085d", "\u0041\u030A"))
      .map(_.mkString(" "))
    samples(noisy, 10).foreach { t =>
      val once = Seq(t).toDF("t")
        .select(TextExpressions.normalizeText(col("t"))).head.getString(0)
      val twice = Seq(once).toDF("t")
        .select(TextExpressions.normalizeText(col("t"))).head.getString(0)
      assert(twice === once, s"not idempotent on ${t.map(_.toInt)}")
      // on this alphabet composition+strip only shrinks (NFC can expand
      // for a few excluded-composition singletons, none generated here)
      assert(once.length <= t.length)
    }
  }

  test("exact dedup is idempotent and keeps one row per distinct text") {
    samples(Gen.listOfN(10, Gen.oneOf("a b c", "d e f", "g h i")), 10)
      .filter(_.nonEmpty).foreach { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val once = Dedup.exact(df, "text", "id")
        assert(once.count() === texts.distinct.size.toLong)
        assert(Dedup.exact(once, "text", "id").count() === once.count())
      }
  }

  private def lakeContent(lake: graft.sources.LakeTable): Map[(Long, String), Long] =
    lake.read.groupBy(col("id"), col("v")).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("upsert is idempotent: applying the same updates twice equals once") {
    samples(Gen.listOfN(8, Gen.zip(Gen.choose(0L, 5L), word)), 6).foreach { rows =>
      val updates = rows.distinctBy(_._1) // merge requires unique keys
      val path = java.nio.file.Files
        .createTempDirectory("graft_prop_upsert").resolve("t").toString
      val lake = graft.sources.LakeTable(spark, path)
        .write((0L to 9L).map(i => (i, s"base$i")).toDF("id", "v"))
      lake.upsert(updates.toDF("id", "v"), Seq("id"))
      val once = lakeContent(lake)
      lake.upsert(updates.toDF("id", "v"), Seq("id"))
      assert(lakeContent(lake) === once, s"upsert not idempotent for $updates")
      // key invariant: ids unique, updated keys carry the update value
      assert(once.keys.map(_._1).toSeq.distinct.size === once.size)
      updates.foreach { case (id, v) => assert(once.contains((id, v))) }
    }
  }

  test("optimize and zorder rewrites preserve table content exactly") {
    val rows = samples(Gen.zip(Gen.choose(0L, 1000L), word), 400)
      .zipWithIndex.map { case ((k, w), i) => (i.toLong, s"$w$k") }
    val path = java.nio.file.Files
      .createTempDirectory("graft_prop_opt").resolve("t").toString
    val lake = graft.sources.LakeTable(spark, path).write(rows.toDF("id", "v"))
    val before = lakeContent(lake)
    lake.optimize(Seq("v"), numFiles = Some(3))
    assert(lakeContent(lake) === before, "optimize changed content")
    lake.optimizeZorder(Seq("id"), numFiles = Some(2))
    assert(lakeContent(lake) === before, "zorder rewrite changed content")
  }

  test("shingle count algebra: 1 <= |shingles| <= tokens - n + 1") {
    samples(Gen.listOfN(5, text), 6).filter(_.nonEmpty).foreach { texts =>
      val rows = texts.toDF("text")
        .select(
          size(TextFunctions.tokens(col("text"))).as("nt"),
          size(TextFunctions.shingles(col("text"), 3)).as("ns"))
        .collect()
      rows.foreach { r =>
        val bound = math.max(r.getInt(0) - 2, 0)
        assert(r.getInt(1) <= bound)
        if (bound > 0) assert(r.getInt(1) >= 1)
      }
    }
  }

  test("fingerprint64: whitespace-insensitive, distinct for distinct token streams") {
    samples(Gen.zip(text, text), 15).foreach { case (a, b) =>
      val fps = Seq(a, a.replace(" ", "   "), b).toDF("t")
        .select(TextFunctions.fingerprint64(col("t"))).collect().map(_.getLong(0))
      assert(fps(0) === fps(1))
      val sameTokens = a.trim.split("\\s+").toSeq == b.trim.split("\\s+").toSeq
      if (!sameTokens) assert(fps(0) !== fps(2))
    }
  }

  test("deterministic stratified sampling is monotone: lower rate is a subset of higher") {
    val docs = graft.core.Tables(spark, sf001).documents
    def sel(f: Double) = graft.operators.Sampling
      .deterministicStratified(docs, "lang", "doc_id", Map("en" -> f, "fr" -> f))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lo = sel(0.2)
    val hi = sel(0.6)
    // threshold samplers nest: raising the rate only ADDS rows — the
    // reproducibility property that lets a pipeline re-run at a higher
    // sampling rate without invalidating the earlier sample
    assert(lo.subsetOf(hi), s"${(lo -- hi).take(5)} selected at 0.2 but not 0.6")
    assert(lo.nonEmpty && hi.size > lo.size)
  }

  test("salted join result is invariant to the salt factor") {
    val t = graft.core.Tables(spark, sf0001)
    val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val p = t.part.select(col("p_partkey"), col("p_type"))
    def agg(k: Int) = graft.operators.Skew.saltedJoin(li, p, "l_partkey", "p_partkey", k)
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(agg(4) === agg(16))
  }

  test("union count algebra: |a union b| = |a| + |b| (bag semantics)") {
    samples(Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(0, 20)), 8).foreach {
      case (n, m) =>
        val a = (0 until n).map(_.toLong).toDF("x")
        val b = (0 until m).map(_.toLong).toDF("x")
        assert(a.union(b).count() === (n + m).toLong)
    }
  }

  test("selective delete equals the full-rewrite delete for random predicates") {
    import org.apache.spark.sql.SaveMode
    val base = java.nio.file.Files.createTempDirectory("graft_seleq")
    def freshPair(tag: String): (graft.sources.LakeTable, graft.sources.LakeTable) = {
      val mk = (name: String, stats: Boolean) => {
        val t = graft.sources.LakeTable(spark, s"$base/$tag-$name")
        (0 until 4).foreach { b =>
          val rows = (b * 50 until (b + 1) * 50).map(i => (i.toLong, i % 7))
          t.write(rows.toDF("id", "g").coalesce(1), SaveMode.Append)
        }
        if (stats) t.collectStats(Seq("id")) else t
      }
      (mk("sel", true), mk("full", false))
    }
    samples(Gen.zip(Gen.chooseNum(0L, 199L), Gen.chooseNum(1L, 80L)), 5)
      .zipWithIndex.foreach { case ((lo, len), i) =>
        val (sel, full) = freshPair(s"p$i")
        val cond = col("id") >= lo && col("id") < lo + len
        sel.delete(cond)
        full.delete(cond)
        def rows(t: graft.sources.LakeTable) =
          t.read.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
        assert(rows(sel) === rows(full), s"predicate [$lo, ${lo + len}) diverged")
      }
  }

  test("fuzzed SQL DELETE/UPDATE routes equal the API calls (tokenizer equivalence)") {
    import org.apache.spark.sql.functions.expr
    // atoms carry the tokenizer's hazards: clause keywords inside string
    // literals, escaped quotes, IN-lists, CASE…END spans
    val strLit = Gen.oneOf(
      "'a'", "'x WHEN y THEN z'", "'DELETE FROM t WHERE'", "'it''s'",
      "'SET v = 1, w = 2'")
    val atom = Gen.oneOf(
      Gen.const("v > 15.0"), Gen.const("id <= 2"),
      strLit.map(s => s"name = $s"),
      strLit.map(s => s"name LIKE $s"),
      Gen.const("id IN (1, 3)"),
      Gen.const("CASE WHEN v >= 20.0 THEN id > 1 ELSE id < 99 END"))
    def pred(depth: Int): Gen[String] =
      if (depth <= 0) atom
      else Gen.frequency(
        3 -> atom,
        2 -> Gen.zip(pred(depth - 1), pred(depth - 1)).map { case (a, b) => s"($a AND $b)" },
        2 -> Gen.zip(pred(depth - 1), pred(depth - 1)).map { case (a, b) => s"($a OR $b)" },
        1 -> pred(depth - 1).map(p => s"NOT ($p)"))
    val base = java.nio.file.Files.createTempDirectory("graft_dmlfuzz")
    def seed(path: String) = graft.sources.LakeTable(spark, path).write(Seq(
      (1L, "a", 10.0), (2L, "x WHEN y THEN z", 20.0), (3L, "it's", 30.0),
      (4L, "DELETE FROM t WHERE", 40.0)).toDF("id", "name", "v"))
    def rows(path: String) = graft.sources.LakeTable(spark, path).read
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val setSql = "v = CASE WHEN id > 2 THEN v * 2 ELSE v END, name = concat(name, ' WHEN')"
    val setApi = Map(
      "v" -> expr("CASE WHEN id > 2 THEN v * 2 ELSE v END"),
      "name" -> expr("concat(name, ' WHEN')"))
    samples(Gen.zip(pred(2), Gen.oneOf(true, false)), 6)
      .zipWithIndex.foreach { case ((p, alias), i) =>
        val sqlPath = s"$base/sql$i"; val apiPath = s"$base/api$i"
        seed(sqlPath); seed(apiPath)
        val aliasSql = if (alias) " AS u" else ""
        spark.sql(s"DELETE FROM graft_lake('$sqlPath')$aliasSql WHERE $p")
        graft.sources.LakeTable(spark, apiPath).delete(expr(p))
        assert(rows(sqlPath) === rows(apiPath), s"DELETE diverged for: $p")
        spark.sql(s"UPDATE graft_lake('$sqlPath')$aliasSql SET $setSql WHERE $p")
        graft.sources.LakeTable(spark, apiPath).update(setApi, expr(p))
        assert(rows(sqlPath) === rows(apiPath), s"UPDATE diverged for: $p")
      }
  }

  test("fuzzed statements with non-lake targets always fall through to Spark's parser") {
    val name = Gen.oneOf("plain_tbl", "db9.t", "a.b.c9", "`quoted id`.t")
    val stmts = name.flatMap(n => Gen.oneOf(
      s"DELETE FROM $n WHERE x > 1",
      s"UPDATE $n SET a = 1 WHERE b = 2",
      s"MERGE INTO $n t USING src s ON t.id = s.id WHEN MATCHED THEN DELETE",
      s"MERGE WITH SCHEMA EVOLUTION INTO $n t USING src s ON t.id = s.id " +
        "WHEN MATCHED THEN DELETE",
      s"INSERT INTO $n VALUES (1)",
      s"INSERT OVERWRITE $n SELECT 1",
      s"OPTIMIZE $n",
      s"VACUUM $n RETAIN 3 VERSIONS",
      s"RESTORE $n TO VERSION AS OF 1",
      s"ALTER TABLE $n ADD COLUMNS (x INT)",
      s"CREATE TABLE $n (x INT) USING parquet",
      s"CREATE OR REPLACE TABLE $n USING parquet LOCATION '/tmp/x'",
      s"CREATE TABLE IF NOT EXISTS $n USING iceberg LOCATION '/tmp/x'",
      s"DESCRIBE $n",
      s"DESCRIBE HISTORY $n",
      s"DESCRIBE DETAIL $n",
      // a garbled tail must not matter: the target decides routing first
      s"DELETE FROM $n WHERE ??? garbled ((("))
    val delegate = spark.sessionState.sqlParser
    samples(stmts, 40).foreach { s =>
      assert(graft.plans.LakeSqlDml.parse(s, delegate).isEmpty,
        s"statement hijacked from Spark's parser: $s")
    }
  }

  test("reproducible corpus shuffle is the md5 permutation, row-pure and engine-checkable") {
    val docs = graft.core.Tables(spark, sf0001).documents
    val got = graft.text.CorpusOps.corpusShuffle(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._2).toSet === ids, "shuffle lost or invented documents")
    assert(got.map(_._1) === got.map(_._1).sorted, "not emitted in key order")
    // the permutation is exactly what an INDEPENDENT md5 implementation
    // derives — row-pure, so any engine/partitioning reproduces it
    val md = java.security.MessageDigest.getInstance("MD5")
    def ref(id: Long): String = md.digest(
      s"graft-shuffle-42:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = ids.toSeq.map(id => (ref(id), id)).sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) === expected)
  }

  test("intra-doc token dedup is idempotent: deduping deduped text changes nothing") {
    import spark.implicits._
    val texts = samples(text, 12).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    def dedupOf(in: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] = {
      val toks = org.apache.spark.sql.functions.split(col("text"), " ")
      in.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
        .groupBy(col("doc_id"), col("tok"))
        .agg(org.apache.spark.sql.functions.min(col("pos")).as("p"))
        .groupBy(col("doc_id"))
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("t"),
          count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(1))).toMap
    }
    val once = dedupOf(df)
    val twice = dedupOf(once.toSeq.map { case (id, (_, t)) => (id, t) }.toDF("doc_id", "text"))
    assert(twice === once)
  }

  test("BPE merges are invariant to input partitioning") {
    val docs = graft.core.Tables(spark, sf0001).documents.where(col("doc_id") < 60)
    val a = graft.text.Bpe.learnMerges(docs.repartition(1), "text", numMerges = 5)
    val b = graft.text.Bpe.learnMerges(docs.repartition(13), "text", numMerges = 5)
    assert(a === b)
  }

  test("BPE encode is idempotent: re-encoding the encoded stream is a no-op") {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sf0001).documents.where(col("doc_id") < 60)
    val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = 12)
    def tokensOf(in: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      graft.text.Bpe.encode(in, "text", merges)
        .select(col("doc_id"), col("bpe_tokens"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val once = tokensOf(docs)
    // a produced token re-derives itself: no merge rule ever crossed what
    // became a token boundary (it would have fused the tokens), so the
    // rank-ordered fold inside each token replays its own derivation
    val twice = tokensOf(
      once.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text"))
    assert(twice === once, "re-encoding the encoded output changed tokens")
  }

  test("scalable BPE encode equals the per-rank fold encode on learned rules") {
    val docs = graft.core.Tables(spark, sf0001).documents.where(col("doc_id") < 80)
    val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = 15)
    def toks(f: (org.apache.spark.sql.DataFrame, String, Seq[graft.text.Bpe.Merge]) =>
        org.apache.spark.sql.DataFrame) =
      f(docs, "text", merges).select(col("doc_id"), col("bpe_tokens"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val folded = toks(graft.text.Bpe.encode)
    val looped = toks(graft.text.Bpe.encodeScalable)
    assert(looped === folded,
      "lowest-rank-present loop diverged from the per-rank folds")
  }

  test("scalable BPE encode handles supplementary code points like the fold path") {
    import spark.implicits._
    // surrogate-pair characters must stay single symbols in both paths
    val docs = Seq(
      (1L, "a😀b a😀b hello hello"),
      (2L, "🍕🍕 plain words here")).toDF("doc_id", "text")
    val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = 6)
    def toks(f: (org.apache.spark.sql.DataFrame, String, Seq[graft.text.Bpe.Merge]) =>
        org.apache.spark.sql.DataFrame) =
      f(docs, "text", merges).select(col("doc_id"), col("bpe_tokens"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val folded = toks(graft.text.Bpe.encode)
    val looped = toks(graft.text.Bpe.encodeScalable)
    assert(looped === folded, s"non-BMP divergence: $looped vs $folded")
    // and the rebuilt text round-trips (no broken surrogate halves)
    looped.foreach { case (id, ts) =>
      assert(!ts.exists(t => t.exists(Character.isSurrogate) &&
        t.codePoints().count() != t.length - 1 && {
          // a token containing an UNPAIRED surrogate is corrupt
          var i = 0; var bad = false
          while (i < t.length) {
            if (Character.isHighSurrogate(t(i)) &&
              (i + 1 >= t.length || !Character.isLowSurrogate(t(i + 1)))) bad = true
            if (Character.isLowSurrogate(t(i)) &&
              (i == 0 || !Character.isHighSurrogate(t(i - 1)))) bad = true
            i += 1
          }
          bad
        }), s"doc $id produced a broken surrogate: $ts")
    }
  }

  test("PQ encode is invariant to input partitioning") {
    val e = graft.core.Tables(spark, sf0001).embeddings
    val books = graft.text.Pq.fitCodebooks(e, "embedding", m = 16, k = 16)
    def codesOf(in: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      graft.text.Pq.encode(in, books, "embedding")
        .select(col("vec_id"), col("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    // encoding is a pure per-row argmin against a FIXED codebook, so the
    // code assignment must be byte-identical however the input is split
    assert(codesOf(e.repartition(1)) === codesOf(e.repartition(11)))
  }

  test("incremental MV refresh equals recompute under random delete/update sequences") {
    import spark.implicits._
    final case class Op(isDelete: Boolean, mod: Long, rem: Long, delta: Long)
    val opGen = for {
      d <- Gen.oneOf(true, false)
      m <- Gen.choose(2L, 5L)
      r <- Gen.choose(0L, 4L)
      delta <- Gen.choose(-10L, 10L)
    } yield Op(d, m, r % m, delta)

    samples(Gen.listOfN(4, opGen), 3).foreach { ops =>
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_mv")
      val base = graft.sources.LakeTable(spark, dir.resolve("base").toString)
      base.write((0L until 30L).map(i =>
        (i, Seq("a", "b", "c")((i % 3).toInt), i * 7 % 13)).toDF("id", "k", "x"))
      val mv = graft.sources.MaterializedAgg(spark, base,
        dir.resolve("view").toString, Seq("k"), Map("sx" -> col("x"))).initialize()
      def viewRows =
        mv.read.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      def recomputed =
        mv.aggregate(base.read).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      ops.foreach { op =>
        if (op.isDelete) base.delete(col("id") % op.mod === op.rem, changeFeed = true)
        else base.update(Map("x" -> (col("x") + op.delta)),
          col("id") % op.mod === op.rem, changeFeed = true)
        mv.refresh()
        assert(viewRows === recomputed,
          s"refresh diverged from recompute after $op in sequence $ops")
      }
    }
  }

  test("SCD2 invariants hold under random sequential batches") {
    import graft.sources.Scd
    // dimension of 6 ids; each day a random subset gets random new values
    val ids = (1L to 6L).toSeq
    val valueGen = Gen.choose(0, 3).map(_.toDouble)
    val batchGen = Gen.someOf(ids).flatMap(sub =>
      Gen.sequence[Seq[(Long, Double)], (Long, Double)](
        sub.toSeq.map(id => valueGen.map(id -> _))))
    var dim = ids.map(id => (id, 0.0, "d00", null.asInstanceOf[String], true))
      .toDF("id", "bal", "valid_from", "valid_to", "is_current")
    samples(batchGen, 6).zipWithIndex.foreach { case (batch, day) =>
      if (batch.nonEmpty) {
        val upd = batch.toSeq.toDF("id", "bal")
          .withColumn("effective_date", lit(f"d${day + 1}%02d"))
        dim = Scd.applyType2(dim, upd, Seq("id"), Seq("bal")).localCheckpoint(true)
      }
    }
    val rows = dim.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getString(2), Option(r.getString(3)), r.getBoolean(4)))
    ids.foreach { id =>
      val hist = rows.filter(_._1 == id).sortBy(_._3)
      // exactly one open row per key, and it is the LAST version
      assert(hist.count(_._5) === 1)
      assert(hist.last._5 && hist.last._4.isEmpty)
      // closed rows chain contiguously: each valid_to is the next valid_from
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a._5 && a._4.contains(b._3),
            s"id $id: ${a._4} must chain to ${b._3}")
        case _ =>
      }
      // consecutive versions always differ in the tracked value
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a._2 != b._2,
          s"id $id: a no-op change must not open a version")
        case _ =>
      }
    }
  }

  test("PSI terms are individually nonnegative on random distribution pairs") {
    // (x - y) ln(x/y) >= 0 for x, y > 0 — Laplace smoothing keeps every
    // proportion strictly positive, so no term can dip below zero
    val vals = Gen.listOfN(200, Gen.choose(0.0, 100.0))
    samples(vals, 6).zipWithIndex.foreach { case (base, i) =>
      val cur = samples(vals, 6)((i + 1) % 6)
      val out = graft.analytics.Drift.psi(
        base.toDF("v"), cur.toDF("v"), "v", bins = 10).collect()
      out.foreach(r => assert(r.getDouble(3) >= 0.0,
        s"negative PSI term in bin ${r.getInt(0)}: ${r.getDouble(3)}"))
      // and a distribution against itself is identically zero
      val self = graft.analytics.Drift.psi(
        base.toDF("v"), base.toDF("v"), "v", bins = 10).collect()
      self.foreach(r => assert(r.getDouble(3) === 0.0))
    }
  }

  test("EWMA stays inside the series' min/max envelope") {
    val series = Gen.nonEmptyListOf(Gen.choose(-50.0, 50.0))
    samples(series, 10).filter(_.nonEmpty).foreach { vs =>
      val e = Seq(vs).toDF("vs").select(expr(
        "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1), " +
          "(acc, x) -> 0.25d * x + 0.75d * acc)")).head.getDouble(0)
      assert(e >= vs.min - 1e-9 && e <= vs.max + 1e-9,
        s"EWMA $e escaped [${vs.min}, ${vs.max}]")
    }
  }

  test("line dedup: never drops below-threshold lines; a df=∞ cap keeps everything") {
    val doc = Gen.listOfN(10, word).map(_.mkString(" "))
    samples(Gen.listOfN(6, doc), 5).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // a threshold no line can reach keeps every line of every doc
      val all = graft.text.CorpusOps
        .dedupLines(df, "doc_id", "text", lineWidth = 4, maxDf = 1000)
        .collect()
      all.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"maxDf=1000 must keep all lines: $r"))
      // at maxDf=2, kept <= total and the count algebra holds
      graft.text.CorpusOps
        .dedupLines(df, "doc_id", "text", lineWidth = 4, maxDf = 2)
        .collect()
        .foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    }
  }

  test("TWAP of a constant series equals the constant; weights are positive") {
    // irregular gaps, constant value -> twap must be exactly that value
    val gaps = Gen.listOfN(20, Gen.choose(1L, 1000000L))
    samples(gaps, 5).foreach { gs =>
      val ts = gs.scanLeft(0L)(_ + _)
      val rows = ts.map(t => ("k", t, 7.25)).toDF("event_type", "ts", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("ts"))
      val twap = rows
        .withColumn("dt", lead(col("ts"), 1).over(w) - col("ts"))
        .where(col("dt").isNotNull)
        .agg((sum(col("value") * col("dt")) / sum(col("dt"))).as("t"))
        .head.getDouble(0)
      assert(twap === 7.25, s"constant series must TWAP to itself: $twap")
    }
  }
}
