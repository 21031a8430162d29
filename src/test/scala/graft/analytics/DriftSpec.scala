package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical samples score exactly zero in every bin") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val out = Drift.psi(df, df, "v", bins = 10).collect()
    assert(out.length === 11) // 10 value bins + the null bin (-1)
    out.foreach { r =>
      assert(r.getDouble(3) === 0.0, s"bin ${r.getInt(0)}: ${r.getDouble(3)}")
      assert(r.getLong(1) === r.getLong(2))
    }
  }

  test("a shifted sample scores positive total PSI; out-of-range mass clamps") {
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    // current: everything pushed up 50%, a third of it beyond the
    // baseline's max — that mass must land in the TOP bin, not vanish
    val cur = (1 to 1000).map(i => i * 1.5).toDF("v")
    val out = Drift.psi(base, cur, "v", bins = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = out.map(_._4).sum
    assert(total > 0.2, s"a 1.5x shift is a major drift, got PSI=$total")
    // top bin holds base's last decile (100) vs cur's clamped overflow
    val top = out.find(_._1 === 9).get
    assert(top._2 === 100L && top._3 > 300L, s"clamp failed: $top")
    // every bin axis row is present even if empty on one side — the
    // null bin (-1) included
    assert(out.map(_._1).toSeq === (-1 until 10))
  }

  test("group PSI isolates the drifted segment; bins come from each group's own baseline") {
    val base = (Seq.tabulate(500)(i => ("a", (i % 100).toDouble)) ++
      Seq.tabulate(500)(i => ("b", (i % 1000).toDouble))).toDF("g", "v")
    // only group a shifts; b is byte-identical
    val cur = (Seq.tabulate(500)(i => ("a", (i % 100) * 2.0)) ++
      Seq.tabulate(500)(i => ("b", (i % 1000).toDouble))).toDF("g", "v")
    val out = Drift.psiByGroup(base, cur, "g", "v", bins = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(4)))
    val psiA = out.filter(_._1 == "a").map(_._3).sum
    val psiB = out.filter(_._1 == "b").map(_._3).sum
    assert(psiA > 0.2, s"shifted group must flag: $psiA")
    assert(psiB === 0.0, s"unchanged group must score exactly zero: $psiB")
    // every group has the full bin axis, null bin included
    assert(out.count(_._1 == "a") === 11 && out.count(_._1 == "b") === 11)
  }

  test("a null-rate shift registers as drift in its own bin") {
    // same value distribution both sides, but 30% of the current side
    // went dark (nulls) — before the null bin existed this showed up only
    // as diffuse mass loss across every bin
    val base = (1 to 1000).map(i => Some((i % 100).toDouble)).toDF("v")
    val cur = (1 to 1000).map(i =>
      if (i % 10 < 3) None else Some((i % 100).toDouble)).toDF("v")
    val out = Drift.psi(base, cur, "v", bins = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nullBin = out.find(_._1 === -1).get
    assert(nullBin._2 === 0L && nullBin._3 === 300L, s"null counts wrong: $nullBin")
    assert(nullBin._4 > 0.1, s"null-rate shift must dominate the score: $nullBin")
    assert(nullBin._4 > out.filter(_._1 >= 0).map(_._4).sum,
      "the null bin should carry more signal than all value bins combined")
    // and per-group: nulls planted in one group only flag that group
    val gBase = (Seq.tabulate(400)(i => ("a", Some((i % 50).toDouble))) ++
      Seq.tabulate(400)(i => ("b", Some((i % 50).toDouble)))).toDF("g", "v")
    val gCur = (Seq.tabulate(400)(i =>
      ("a", if (i % 2 == 0) None else Some((i % 50).toDouble))) ++
      Seq.tabulate(400)(i => ("b", Some((i % 50).toDouble)))).toDF("g", "v")
    val g = Drift.psiByGroup(gBase, gCur, "g", "v", bins = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(4)))
    val aNull = g.find(x => x._1 == "a" && x._2 == -1).get._3
    val bSum = g.filter(_._1 == "b").map(_._3).sum
    assert(aNull > 0.1, s"group a's null bin must flag: $aNull")
    assert(bSum === 0.0, s"untouched group must stay zero: $bSum")
  }

  test("empty bins stay finite through Laplace smoothing") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(1.0, 2.0, 3.0).toDF("v") // most bins empty on the current side
    val out = Drift.psi(base, cur, "v", bins = 10).collect()
    out.foreach(r => assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("embedding drift: stable slice reads 1.0/0.0, shifted slice registers, deleted slice surfaces") {
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val base = Seq(
      (1L, 0, vec(1, 0, 0)), (2L, 0, vec(1, 0.2, 0)),   // label 0: kept as-is
      (3L, 1, vec(0, 1, 0)), (4L, 1, vec(0, 1, 0.2)),   // label 1: half replaced
      (5L, 2, vec(0, 0, 1)), (6L, 2, vec(0.2, 0, 1))    // label 2: fully deleted
    ).toDF("vec_id", "label", "embedding")
    val cur = Seq(
      (1L, 0, vec(1, 0, 0)), (2L, 0, vec(1, 0.2, 0)),
      (3L, 1, vec(0, 1, 0)), (7L, 1, vec(1, 0, 0)),     // label 1 pulled toward x
      (8L, 3, vec(0, 1, 1))                             // label 3: brand-new slice
    ).toDF("vec_id", "label", "embedding")
    val out = Drift.embeddingDrift(base, cur, "label", "embedding")
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val byLabel = out.map(t => t._1 -> t).toMap
    assert(byLabel(0) === ((0, 2L, 2L, Some(1.0), Some(0.0))), byLabel(0))
    val l1 = byLabel(1)
    assert(l1._2 === 2L && l1._3 === 2L && l1._4.get < 0.999 && l1._5.get > 0.1,
      s"shifted slice must register: $l1")
    // a fully-deleted label keeps its row: n_cur = 0 and NULL metrics
    // (no centroid exists to compare against) — the count is the signal
    val l2 = out.find(_._1 == 2).get
    assert(l2._3 === 0L && l2._4.isEmpty && l2._5.isEmpty,
      s"deleted slice must surface with n_cur = 0: $l2")
    // the mirror case (full outer, not left): a label present ONLY in
    // current must surface with n_base = 0 and NULL metrics — a gate
    // watching this report sees new slices appear, not just vanish
    val l3 = out.find(_._1 == 3).get
    assert(l3._2 === 0L && l3._3 === 1L && l3._4.isEmpty && l3._5.isEmpty,
      s"brand-new slice must surface with n_base = 0: $l3")
  }
}
