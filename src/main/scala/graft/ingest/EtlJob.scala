package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Deidentify
import graft.sources.{Catalog, CsvIngest, LakeTable}

/** The reference's ETL pipeline (00-etl-rwd.py) re-expressed: CSV landing ->
  * PII de-identification -> renames -> lake tables -> star join ->
  * catalog registration -> clustering.
  *
  * Layout mirrors the reference's lake (00-etl-rwd.py:94-141, 151-200):
  * patients/encounters/providers/organizations + the patient_encounters
  * star join, as parquet LakeTables registered in a session database.
  */
object EtlJob {

  /** The 10 PII columns hashed by the reference (00-etl-rwd.py:75). */
  val PiiCols: Seq[String] = Seq(
    "SSN", "DRIVERS", "PASSPORT", "PREFIX", "FIRST", "LAST",
    "SUFFIX", "MAIDEN", "BIRTHPLACE", "ADDRESS")

  case class EtlResult(
      patients: DataFrame,
      encounters: DataFrame,
      providers: DataFrame,
      organizations: DataFrame,
      patientEncounters: DataFrame)

  /** Run the full pipeline.
    *
    * @param csvDir   landing zone with patients/encounters/providers/
    *                 organizations CSVs
    * @param lakeDir  destination lake directory
    * @param database catalog database name to (re)register tables in
    */
  def run(spark: SparkSession, csvDir: String, lakeDir: String, database: String): EtlResult = {
    // ingest + de-identify patients (00-etl-rwd.py:62-79)
    val patients = Deidentify(
      CsvIngest.ingest(spark, s"$csvDir/patients.csv"), PiiCols)

    // encounters renames (00-etl-rwd.py:96-98) + provider->organization
    // (00:133)
    val encounters = CsvIngest.ingest(spark, s"$csvDir/encounters.csv")
      .withColumnRenamed("Id", "Enc_Id")
      .withColumnRenamed("START", "START_TIME")
      .withColumnRenamed("STOP", "END_TIME")
      .withColumnRenamed("PROVIDER", "ORGANIZATION")

    // providers renames (00:105-106)
    val providers = CsvIngest.ingest(spark, s"$csvDir/providers.csv")
      .withColumnRenamed("Id", "PROVIDER")
      .withColumnRenamed("NAME", "Provider_Name")

    // organizations renames (00:112-119)
    val organizations = CsvIngest.ingest(spark, s"$csvDir/organizations.csv")
      .withColumnRenamed("Id", "ORGANIZATION")
      .withColumnRenamed("NAME", "Org_Name")
      .withColumnRenamed("ADDRESS", "PROVIDER_ADDRESS")
      .withColumnRenamed("CITY", "PROVIDER_CITY")
      .withColumnRenamed("STATE", "PROVIDER_STATE")
      .withColumnRenamed("ZIP", "PROVIDER_ZIP")
      .withColumnRenamed("GENDER", "PROVIDER_GENDER")

    // star join (00:136-141): encounters ⋈ patients ⋈ organizations.
    // patients/organizations are dimensions -> broadcast; at 100 TB only
    // the encounters fact side streams.
    val patientEncounters = encounters
      .join(broadcast(patients.withColumnRenamed("Id", "PATIENT")), Seq("PATIENT"))
      .join(broadcast(organizations), Seq("ORGANIZATION"))

    // lake tables + catalog (00:151-200)
    val tables = Seq(
      "patients" -> patients,
      "encounters" -> encounters,
      "providers" -> providers,
      "organizations" -> organizations,
      "patient_encounters" -> patientEncounters)
    Catalog.createDatabase(spark, database)
    tables.foreach { case (name, df) =>
      val path = s"$lakeDir/$name"
      LakeTable(spark, path).write(df)
      Catalog.registerTable(spark, database, name, path)
    }

    // clustering, the OPTIMIZE/ZORDER substitute (00:213,217)
    LakeTable(spark, s"$lakeDir/patient_encounters")
      .optimize(Seq("REASONDESCRIPTION", "START_TIME"), numFiles = Some(4))

    EtlResult(patients, encounters, providers, organizations,
      spark.table(s"`$database`.patient_encounters"))
  }
}
