package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def walk(n: Int, bits: Int): Seq[(Long, Array[Long])] = {
    val side = 1 << bits
    val cells = Seq.fill(n)(0 until side).foldLeft(Seq(Seq.empty[Int])) {
      (acc, dim) => for (prefix <- acc; v <- dim) yield prefix :+ v
    }
    cells
      .map(c => Hilbert.index(c.map(_.toLong).toArray, bits) -> c.map(_.toLong).toArray)
      .sortBy(_._1)
  }

  test("2D curve is a bijection and every step is grid-adjacent") {
    val w = walk(n = 2, bits = 4) // 16x16 grid, 256 cells
    assert(w.map(_._1) === (0L until 256L))
    w.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      val manhattan = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(manhattan === 1L,
        s"cells ${a.toSeq} -> ${b.toSeq} not adjacent (the defining Hilbert property)")
    }
  }

  test("3D curve is a bijection and every step is grid-adjacent") {
    val w = walk(n = 3, bits = 3) // 8x8x8 grid, 512 cells
    assert(w.map(_._1) === (0L until 512L))
    w.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a.zip(b).map { case (x, y) => math.abs(x - y) }.sum === 1L)
    }
  }

  test("Morton order violates adjacency where Hilbert cannot") {
    // the classic Z-jump: Morton position 1 -> 2 leaps from (0,1) to
    // (1,0) — Manhattan distance 2. This is exactly the discontinuity
    // Hilbert clustering removes.
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (morton(x, y, 4), (x, y))
    val jumps = cells.sortBy(_._1).sliding(2).count {
      case Seq((_, (ax, ay)), (_, (bx, by))) =>
        math.abs(ax - bx) + math.abs(ay - by) > 1
    }
    assert(jumps > 0, "Morton should have non-adjacent steps")
  }

  test("expression matches the direct function, inside a Spark plan") {
    val df = (0L until 32L).flatMap(x => (0L until 32L).map(y => (x, y)))
      .toDF("x", "y")
    val out = df
      .withColumn("h", Hilbert.hilbertIndex(Seq(col("x"), col("y")), bits = 5))
      .collect()
    out.foreach { r =>
      val expected = Hilbert.index(Array(r.getLong(0), r.getLong(1)), 5)
      assert(r.getLong(2) === expected)
    }
    // bijection through the engine too
    assert(out.map(_.getLong(2)).toSet.size === 1024)
  }

  test("interpreted and codegen paths agree") {
    val df = Seq((7L, 11L, 3L)).toDF("x", "y", "z")
    val cols = Seq(col("x"), col("y"), col("z"))
    val withCodegen = df.select(Hilbert.hilbertIndex(cols, 5)).head.getLong(0)
    // restore whatever was set BEFORE the test, not hardcoded defaults —
    // otherwise a suite running under non-default codegen conf leaks
    val savedWhole = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val savedMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    def restore(key: String, v: Option[String]): Unit =
      v.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(Hilbert.hilbertIndex(cols, 5)).head.getLong(0)
      assert(withCodegen === interpreted)
      assert(withCodegen === Hilbert.index(Array(7L, 11L, 3L), 5))
    } finally {
      restore("spark.sql.codegen.wholeStage", savedWhole)
      restore("spark.sql.codegen.factoryMode", savedMode)
    }
  }

  test("NULL input yields NULL") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("x", "y")
      .withColumn("h", Hilbert.hilbertIndex(Seq(col("x"), col("y")), bits = 4))
    val rows = df.select("h").collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("hilbert-clustered files have no larger bounding boxes than z-order") {
    // 64x64 grid split into 64 sorted runs of 64 cells: sum of per-run
    // bounding-box areas measures how compactly a file span tiles space.
    // Hilbert's adjacency guarantee should tile at least as tightly as
    // Morton for the same run length.
    def area(run: Seq[(Long, Long)]): Long = {
      val (xs, ys) = run.unzip
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val cells = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val hRuns = cells.sortBy { case (x, y) => Hilbert.index(Array(x, y), 6) }
      .grouped(64).map(area).sum
    val zRuns = cells.sortBy { case (x, y) => morton(x, y, 6) }
      .grouped(64).map(area).sum
    assert(hRuns <= zRuns, s"hilbert bbox total $hRuns vs z-order $zRuns")
  }
}
