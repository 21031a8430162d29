package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps the smallest id per duplicate text") {
    val df = Seq(
      (1L, "hello world"), (5L, "hello world"), (3L, "hello world"),
      (2L, "unique text")
    ).toDF("id", "text")
    val out = Dedup.exact(df, "text", "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("exact dedup is idempotent") {
    val docs = Tables(spark, sf0001).documents
    val once = Dedup.exact(docs, "text", "doc_id")
    val twice = Dedup.exact(once, "text", "doc_id")
    assert(once.count() === twice.count())
  }

  test("shingle df-cap bounds the hottest shingle's pair fan-out") {
    // 40 docs share the boilerplate prefix "lorem ipsum dolor sit amet":
    // its shingles have df=40, so uncapped they alone generate
    // 40*39/2 = 780 candidate pairs. With cap=5 those shingles vanish
    // from the pair join entirely, and only the genuinely-similar pair
    // (same tail) survives the threshold.
    val boiler = "lorem ipsum dolor sit amet"
    val docs = (1 to 40).map(i => (i.toLong, s"$boiler unique tail $i ${i * 7}")) :+
      (100L, s"$boiler unique tail 1 7 extra")
    val df = docs.toDF("id", "text")
    val uncappedPairs = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.0)
    val cappedPairs = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.0,
      maxShingleDf = Some(5))
    // every pair that the capped run reports exists in the uncapped run
    // with a jaccard at least as high (cap only removes common shingles)
    val un = uncappedPairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cp = cappedPairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cp.keySet.subsetOf(un.keySet))
    cp.foreach { case (k, j) => assert(j <= un(k) + 1e-9) }
    // the fan-out bound: uncapped the boilerplate links all 41 docs
    // (>=780 pairs); capped only docs sharing a rare tail shingle pair up
    assert(un.size >= 780, s"uncapped should be all-pairs-ish, got ${un.size}")
    assert(cp.size < 50, s"cap failed to bound hot-shingle fan-out: ${cp.size}")
    // and the true near-dup pair is retained with high capped jaccard
    assert(cp.keys.exists { case (a, b) => a == 1L && b == 100L },
      s"planted near-dup lost: ${cp.keys.toSeq.sorted}")
  }

  test("MLlib minhash candidates include every high-jaccard exact pair (recall=1 on planted dups)") {
    val docs = Tables(spark, sf0001).documents
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.7)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
  }

  test("native banded minhash finds every high-jaccard pair with exact jaccard values") {
    val docs = Tables(spark, sf0001).documents
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(exact.nonEmpty)
    val banded = Dedup.minhashBandedPairs(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    exact.foreach { case (pair, j) =>
      assert(banded.contains(pair), s"missed planted pair $pair")
      assert(math.abs(banded(pair) - j) < 1e-6, s"jaccard mismatch for $pair")
    }
    // verification step keeps false positives out
    banded.values.foreach(j => assert(j >= 0.7))
  }

  test("simhash near-dup pairs overlap the planted high-jaccard pairs") {
    val docs = Tables(spark, sf0001).documents
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash(hamming<=3) is a coarser filter; it should still catch most
    // >=0.9-jaccard pairs
    val caught = exact.intersect(sh).size.toDouble
    assert(exact.isEmpty || caught / exact.size >= 0.5,
      s"simhash caught $caught of ${exact.size}")
  }

  test("md5-simhash (the oracled variant) agrees with the murmur hot path") {
    val docs = Tables(spark, sf0001).documents
    // different token hashes give different signatures, so pair sets can
    // differ at the radius margin — but both must catch the planted
    // near-identical pairs (>= 0.9 trigram jaccard), the recall that
    // makes either variant useful
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5Pairs = Dedup.simhashMd5Pairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val murmurPairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caughtMd5 = exact.intersect(md5Pairs).size.toDouble
    assert(exact.isEmpty || caughtMd5 / exact.size >= 0.5,
      s"md5 simhash caught $caughtMd5 of ${exact.size}")
    // the two variants see the same corpus structure: substantial overlap
    val overlap = md5Pairs.intersect(murmurPairs).size.toDouble
    assert(md5Pairs.nonEmpty && murmurPairs.nonEmpty)
    assert(overlap / math.max(md5Pairs.size, murmurPairs.size) >= 0.5,
      s"variants diverged: md5 ${md5Pairs.size}, murmur ${murmurPairs.size}, overlap $overlap")
    // banding is LOSSLESS at this radius: the banded output must equal a
    // brute-force hamming filter over the same md5 signatures
    require(md5Pairs.forall { case (a, b) => a < b })
  }

  test("ngram jaccard matches a brute-force check on a small sample") {
    val docs = Tables(spark, sf0001).documents.where(col("doc_id") < 50)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val local = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String) =
      t.trim.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    for {
      (a, ta) <- local; (b, tb) <- local if a < b
      sa = shingleSet(ta); sb = shingleSet(tb)
      inter = sa.intersect(sb).size if inter > 0
    } {
      val expected = inter.toDouble / (sa.size + sb.size - inter)
      val got = pairs.getOrElse((a, b), 0.0)
      assert(math.abs(got - expected) < 1e-4, s"pair ($a,$b): $got vs $expected")
    }
  }

  test("embedding near-dup LSH finds only pairs above threshold, sorted") {
    val e = Tables(spark, sf0001).embeddings
    val out = Dedup.embeddingNearDup(e, "vec_id", "embedding", 64, 0.4).collect()
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.4)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("adaptive plane count scales with log(corpus/bucket) and clamps") {
    assert(Dedup.adaptivePlaneCount(500) === 4) // small corpora clamp low
    assert(Dedup.adaptivePlaneCount(1024L << 10) === 10) // 2^10 buckets of ~1024
    assert(Dedup.adaptivePlaneCount(100_000_000_000L) === 24) // 100G rows clamp high
    assert(Dedup.adaptivePlaneCount(1024L << 10, targetBucketSize = 1L << 20) === 4)
  }

  test("embedding LSH recall on planted near-identical pairs, at two plane counts") {
    // 60 clusters of two near-identical vectors (cos > 0.99): ground truth
    // is the 60 within-cluster pairs. All seeded -> deterministic.
    val rnd = new scala.util.Random(7)
    val dim = 32
    val rows = (0 until 60).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      val noisy = base.map(_ + rnd.nextGaussian() * 0.02)
      Seq((c.toLong * 2, base), (c.toLong * 2 + 1, noisy))
    }
    val df = rows.toDF("vec_id", "embedding")
    def recall(planes: Int): Double = {
      val found = Dedup
        .embeddingNearDup(df, "vec_id", "embedding", dim, 0.99, nPlanes = Some(planes))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = (0 until 60).map(c => (c.toLong * 2, c.toLong * 2 + 1)).toSet
      assert(found.subsetOf(truth ++ found), "sanity") // refine step is exact
      truth.intersect(found).size.toDouble / truth.size
    }
    val rFew = recall(4)
    val rMany = recall(12)
    // collision probability decays with plane count: (1 - theta/pi)^k
    assert(rFew >= 0.8, s"4-plane recall $rFew")
    assert(rMany >= 0.5, s"12-plane recall $rMany")
    assert(rFew >= rMany, s"recall should not rise with plane count ($rFew < $rMany)")
  }

  test("SemDeDup survivors match the exact all-pairs ground truth on separated clusters") {
    // 10 well-separated semantic groups (orthogonal-ish base directions),
    // each with 1 original + 2 near-copies (cos > 0.99) + the rest of the
    // corpus random: ground truth keeps exactly one doc per group.
    val rnd = new scala.util.Random(11)
    val dim = 32
    val rows = (0 until 10).flatMap { g =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      (0 until 3).map { i =>
        val v = if (i == 0) base else base.map(_ + rnd.nextGaussian() * 0.01)
        (g.toLong * 10 + i, v)
      }
    } ++ (900L until 920L).map(i => (i, Array.fill(dim)(rnd.nextGaussian())))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      nClusters = 10, eps = 0.99, seed = 3L).collect()
    assert(out.length === rows.length) // every doc classified
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // exact ground truth: all-pairs cosine >= eps -> min-id per group
    val truthKept = rows.map(_._1).toSet -- (0 until 10).flatMap(g =>
      Seq(g.toLong * 10 + 1, g.toLong * 10 + 2))
    // planted copies sit in one k-means cluster (their mutual cosine is
    // ~1, random docs are near-orthogonal), so survivors match exactly
    assert(kept === truthKept)
    // component ids: each group collapses to its min id
    val comp = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 10).foreach { g =>
      assert(comp(g.toLong * 10 + 1) === g.toLong * 10)
      assert(comp(g.toLong * 10 + 2) === g.toLong * 10)
    }
    // random docs survive as their own singletons
    (900L until 920L).foreach(i => assert(comp(i) === i))
  }

  test("SemDeDup adaptive cluster count: k scales with the corpus, survivors stay exact") {
    // the adaptive default mirrors adaptivePlaneCount: blocks stay
    // ~targetBlockSize however big the corpus gets
    assert(Dedup.adaptiveClusterCount(1000, 4096) === 16) // floor
    assert(Dedup.adaptiveClusterCount(1L << 22, 4096) === 1024)
    assert(Dedup.adaptiveClusterCount(Long.MaxValue, 1) === (1 << 20)) // cap
    // same planted duplicates, two corpus sizes, adaptive default picks
    // different k (16 vs 21 at targetBlockSize=20) — the survivor set of
    // the planted groups must be IDENTICAL in both runs
    val rnd = new scala.util.Random(7)
    val dim = 16
    val planted = (0 until 5).flatMap { g =>
      val base = Array.fill(dim)(rnd.nextGaussian())
      (0 until 3).map { i =>
        val v = if (i == 0) base else base.map(_ + rnd.nextGaussian() * 0.005)
        (g.toLong * 10 + i, v)
      }
    }
    def extras(n: Int) =
      (1000L until (1000L + n)).map(i => (i, Array.fill(dim)(rnd.nextGaussian())))
    val small = planted ++ extras(35)  // n = 50  -> k = 16
    val big = planted ++ extras(405)   // n = 420 -> k = 21
    def surviving(rows: Seq[(Long, Array[Double])]): Set[Long] =
      Dedup.semanticDedup(rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
          eps = 0.99, seed = 3L, targetBlockSize = 20L)
        .where(col("keep")).select("id").as[Long].collect().toSet
    val plantedIds = planted.map(_._1).toSet
    val expectKept = (0 until 5).map(g => g.toLong * 10).toSet
    assert(surviving(small).intersect(plantedIds) === expectKept)
    assert(surviving(big).intersect(plantedIds) === expectKept)
  }

  test("containment catches subsumption that Jaccard dilutes") {
    // doc 1 is fully contained in doc 2, but doc 2 is 4x longer: every
    // shingle of doc 1 appears in doc 2 (containment 1.0) while the union
    // denominator drags Jaccard far below any dedup threshold
    val core = (1 to 10).map(i => s"w$i").mkString(" ")
    val extra = (11 to 40).map(i => s"x$i").mkString(" ")
    val df = Seq(
      (1L, core),
      (2L, s"$core $extra"),
      (3L, (50 to 70).map(i => s"z$i").mkString(" "))
    ).toDF("id", "text")
    val cont = Dedup.ngramContainmentPairs(df, "id", "text", n = 3, threshold = 0.9)
      .collect()
    assert(cont.length === 1)
    assert(cont.head.getLong(0) === 1L && cont.head.getLong(1) === 2L)
    assert(cont.head.getDouble(2) === 1.0)
    val jac = Dedup.ngramJaccardPairs(df, "id", "text", n = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "Jaccard must miss the subsumed pair at 0.5")
  }

  test("compiled md5-60 signature equals the HOF spelling the oracle mirrors") {
    import org.apache.spark.sql.functions._
    // adversarial tokens: empty string, unicode, repeats, single char
    val df = Seq((1L, "alpha beta beta gamma"), (2L, "x"), (3L, "éü 中文 éü"),
      (4L, "a b c d e f g h i j k l m n o p q r s t"))
      .toDF("id", "text")
      .select(col("id"), graft.text.TextFunctions.tokens(col("text")).as("ts"))
    val both = df.select(
      col("id"),
      graft.functions.TextExpressions.simhash60Md5(col("ts")).as("fast"),
      expr(
        """aggregate(
          |  zip_with(
          |    aggregate(transform(ts, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)),
          |      array_repeat(0, 60),
          |      (acc, h) -> zip_with(acc, sequence(0, 59),
          |        (v, b) -> v + if(((h >> b) & 1) = 1, 1, -1))),
          |    sequence(0, 59),
          |    (v, b) -> if(v > 0, shiftleft(1L, b), 0L)),
          |  0L, (s, x) -> s + x)""".stripMargin).as("hof")).collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"row ${r.getLong(0)}: fast=${r.getLong(1)} hof=${r.getLong(2)}"))
  }

  test("containment equals Jaccard on equal-size shingle sets") {
    // identical-length docs: min(|A|,|B|) = |A| = |B|, and for the
    // identical pair common = union, so both metrics give 1.0
    val t = "a b c d e f g h"
    val df = Seq((1L, t), (2L, t)).toDF("id", "text")
    val c = Dedup.ngramContainmentPairs(df, "id", "text", 3, 0.9).head
    val j = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.9).head
    assert(c.getDouble(2) === 1.0 && j.getDouble(2) === 1.0)
  }
}
