package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ADD CONSTRAINT vs concurrent-writer race, pinned with
  * deterministic interleaves (the onResolvedForTest seam pattern).
  *
  * The hazard has two symmetric halves:
  *   - DDL half: `addConstraint` validates the table at version V, and a
  *     writer commits VIOLATING rows before the constraint file
  *     publishes — the published constraint then lies about the data.
  *     Closure: validation re-runs whenever the log moved during it
  *     (version re-check before publication).
  *   - writer half: a write validates its batch against the pre-DDL
  *     constraint set, the DDL publishes (its own validation never saw
  *     the in-flight batch), and the writer's commit lands violating
  *     rows. Closure: the writer re-reads the constraint set just before
  *     its point of no return and validates the batch against any
  *     late-arriving checks (Delta surfaces this interleave as
  *     MetadataChangedException; validating is strictly stronger).
  */
class ConstraintRaceSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) =
    Files.createTempDirectory(s"graft_consrace_$name").toString + "/t"

  test("DDL half: a violating append landing mid-validation fails the ADD CONSTRAINT") {
    val dir = fresh("ddl")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x").coalesce(1))
    // between validation and the movement re-check, a concurrent writer
    // (fresh handle — no shared state) lands a row violating the
    // about-to-publish constraint; with no constraint saved yet, that
    // append is legal
    var fired = 0
    lake.onConstraintValidatedForTest = () => {
      if (fired == 0) {
        fired += 1
        LakeTable(spark, dir).write(
          Seq((3L, -5.0)).toDF("id", "x").coalesce(1), SaveMode.Append): Unit
      }
    }
    try {
      val e = intercept[IllegalArgumentException] {
        lake.addConstraint("x_pos", "x > 0")
      }
      assert(e.getMessage.contains("x_pos"), e.getMessage)
      assert(fired == 1, "interleaved append never ran")
    } finally lake.onConstraintValidatedForTest = () => ()
    // the constraint did NOT publish over data that violates it
    assert(!LakeTable(spark, dir).constraints.contains("x_pos"))
    assert(LakeTable(spark, dir).read.count() === 3L)
  }

  test("DDL half: benign movement mid-validation re-validates and publishes") {
    val dir = fresh("benign")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, 10.0)).toDF("id", "x").coalesce(1))
    var fired = 0
    lake.onConstraintValidatedForTest = () => {
      if (fired == 0) {
        fired += 1
        LakeTable(spark, dir).write(
          Seq((2L, 99.0)).toDF("id", "x").coalesce(1), SaveMode.Append): Unit
      }
    }
    try lake.addConstraint("x_pos", "x > 0")
    finally lake.onConstraintValidatedForTest = () => ()
    assert(fired == 1)
    assert(LakeTable(spark, dir).constraints.contains("x_pos"))
  }

  test("writer half: a constraint published mid-append re-validates the in-flight batch") {
    val dir = fresh("writer")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, 10.0)).toDF("id", "x").coalesce(1))
    // the DDL lands AFTER the append validated its batch (against the
    // then-empty constraint set) and BEFORE its point of no return; its
    // own validation sees only committed data, so it publishes cleanly
    var fired = 0
    lake.onBatchValidatedForTest = () => {
      if (fired == 0) {
        fired += 1
        LakeTable(spark, dir).addConstraint("x_pos", "x > 0"): Unit
      }
    }
    try {
      val e = intercept[IllegalArgumentException] {
        lake.write(Seq((2L, -1.0)).toDF("id", "x").coalesce(1), SaveMode.Append)
      }
      assert(e.getMessage.contains("x_pos"), e.getMessage)
      assert(fired == 1, "interleaved DDL never ran")
    } finally lake.onBatchValidatedForTest = () => ()
    // no partial state: the violating batch never landed, the constraint
    // stands, and the table satisfies it
    val fresh2 = LakeTable(spark, dir)
    assert(fresh2.constraints.contains("x_pos"))
    assert(fresh2.read.count() === 1L)
    fresh2.addConstraint("x_pos2", "x > 0"): Unit // full-table re-validation passes
  }

  test("writer half: a clean in-flight batch passes the late re-validation and lands") {
    val dir = fresh("clean")
    val lake = LakeTable(spark, dir)
    lake.write(Seq((1L, 10.0)).toDF("id", "x").coalesce(1))
    var fired = 0
    lake.onBatchValidatedForTest = () => {
      if (fired == 0) {
        fired += 1
        LakeTable(spark, dir).addConstraint("x_pos", "x > 0"): Unit
      }
    }
    try lake.write(Seq((2L, 5.0)).toDF("id", "x").coalesce(1), SaveMode.Append)
    finally lake.onBatchValidatedForTest = () => ()
    assert(fired == 1)
    assert(LakeTable(spark, dir).read.count() === 2L)
    assert(LakeTable(spark, dir).constraints.contains("x_pos"))
  }
}
