package graft.features

import org.apache.spark.ml.feature.{StringIndexer, StringIndexerModel, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's patient-trajectory featurization
  * (02-patient-trajectory.py:98-176 / include/featurise.py) re-expressed.
  *
  * Pipeline per the reference, with its deliberate quirks preserved
  * (SURVEY §7.5.3):
  *   - `day` = datediff(START_TIME, min(START_TIME)) via a broadcast scalar
  *     (the reference's 1-row crossJoin, 02:101-113)
  *   - `age` in days at encounter (02:114-115)
  *   - one boolean comorbidity flag per condition via LIKE (02:124)
  *   - trailing `windowDays` range-frame sums EXCLUDING the current day
  *     (rangeBetween(-days, -1), 02:152-165)
  *   - recent_encounters = count over the same frame (02:168)
  *   - label = presence of comorbidity_0 on the day (02:174)
  *   - StringIndexers with handleInvalid=skip (02:127-150), VectorAssembler
  *     (02:171-172)
  */
object Featurizer {

  case class Featurized(
      data: DataFrame,
      indexers: Seq[StringIndexerModel],
      featureCols: Seq[String])

  def encounterFeatures(
      patientEncounters: DataFrame,
      comorbidities: Seq[String],
      windowDays: Int
  ): DataFrame = {
    val pe = patientEncounters
      .where(col("REASONDESCRIPTION").isNotNull)
      .withColumn("START_TS", to_timestamp(col("START_TIME")))
    // the reference's lowest-date crossJoin (1-row broadcast scalar)
    val lowest = pe.agg(min(col("START_TS")).as("lowest"))
    val withDay = pe.crossJoin(broadcast(lowest))
      .withColumn("day", datediff(col("START_TS"), col("lowest")))
      .withColumn("age",
        datediff(col("START_TS"), to_date(col("BIRTHDATE"))))
    val flagged = comorbidities.zipWithIndex.foldLeft(withDay) {
      case (d, (cond, i)) =>
        d.withColumn(s"comorbidity_$i",
          lower(col("REASONDESCRIPTION")).contains(cond.toLowerCase).cast("int"))
    }
    val w = Window.partitionBy(col("PATIENT")).orderBy(col("day"))
      .rangeBetween(-windowDays, -1)
    val windowed = comorbidities.indices.foldLeft(flagged) { case (d, i) =>
      d.withColumn(s"recent_$i",
        coalesce(sum(col(s"comorbidity_$i")).over(w), lit(0L)))
    }
    windowed
      .withColumn("recent_encounters", count(lit(1)).over(w))
      .withColumn("label", col("comorbidity_0"))
  }

  /** Fit indexers on train, assemble features; reuse the SAME fitted
    * indexers for any later (test) set, as the reference does
    * (02-patient-trajectory.py:140-150).
    */
  def assemble(
      featurized: DataFrame,
      categoricalCols: Seq[String],
      numericCols: Seq[String]
  ): Featurized = {
    val indexers = categoricalCols.map { c =>
      new StringIndexer()
        .setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("skip")
        .fit(featurized)
    }
    val indexed = indexers.foldLeft(featurized)((d, m) => m.transform(d))
    val featCols = numericCols ++ categoricalCols.map(c => s"${c}_idx")
    val assembled = new VectorAssembler()
      .setInputCols(featCols.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(indexed)
    Featurized(assembled, indexers, featCols)
  }

  def applyIndexers(df: DataFrame, fz: Featurized): DataFrame = {
    val indexed = fz.indexers.foldLeft(df)((d, m) => m.transform(d))
    new VectorAssembler()
      .setInputCols(fz.featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(indexed)
  }
}
