package graft.fhir

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark

/** The reference's E2 entry point (SURVEY.md §3): SQL text run verbatim
  * (modulo catalog prefix) against the per-resource tables our S4 writer
  * registered — mirrors 01_dbignite_sample.py:232-243 (patient⋈condition),
  * :340-346 (claim-type counts shape), :370-397 (staging dedup probe),
  * :431-459 (ADT feed), :468-484 (OMOP person). */
class FhirSqlSpec extends AnyFunSuite {

  private val adtDir = getClass.getResource("/adt").getPath
  private val db = "graft_sql_test"

  private lazy val setup: Unit = {
    val bundles = BundleReader.readFromDirectory(spark, adtDir).entry()
    val base = Files.createTempDirectory("graft_sql_tables").toString
    TableWriter.bulkTableWrite(bundles, db,
      columns = Seq("Patient", "Condition", "MessageHeader", "Encounter"),
      basePath = Some(base))
    AdtActions.register(spark)
  }

  test("patient ⋈ condition SQL over resource tables (ref :232-243)") {
    setup
    val rows = spark.sql(
      s"""SELECT p.patient.id AS patient_id,
         |       c.condition.code.coding[0].code AS condition_code
         |FROM (SELECT bundleUUID, explode(Patient) AS patient
         |      FROM $db.patient) p
         |INNER JOIN (SELECT bundleUUID, explode(Condition) AS condition
         |            FROM $db.condition) c
         |  ON p.bundleUUID = c.bundleUUID
         |LIMIT 10""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "pat-carl")
    assert(rows.head.getString(1) == "10509002")
  }

  test("ADT feed SQL with HOF identifier filter + get_action (ref :431-459)") {
    setup
    val rows = spark.sql(
      s"""SELECT filter(p.identifier,
         |              x -> x.system == 'http://hl7.org/fhir/sid/us-ssn')[0].value
         |         AS ssn,
         |       get_action(mh.eventCoding.code).action AS action,
         |       m.timestamp
         |FROM (SELECT bundleUUID, timestamp, explode(MessageHeader) AS mh
         |      FROM $db.messageheader) m
         |INNER JOIN (SELECT bundleUUID, explode(Patient) AS p
         |            FROM $db.patient) p0
         |  ON m.bundleUUID = p0.bundleUUID
         |ORDER BY ssn DESC, m.timestamp DESC
         |LIMIT 10""".stripMargin).collect()
    assert(rows.length == 4)
    assert(rows.head.getString(0) == "666-66-6666")
    assert(rows.map(_.getString(1)).toSet ==
      Set("admit", "track_departure", "create_person", "update_person"))
  }

  test("staging-dedup existence probe SQL (ref :370-397)") {
    setup
    val rows = spark.sql(
      s"""SELECT s.p.id AS patient_id,
         |       CASE WHEN t.p.id IS NOT NULL THEN 'Y' ELSE 'N' END
         |         AS already_exists
         |FROM (SELECT explode(Patient) AS p FROM $db.patient
         |      WHERE timestamp = '2023-04-02T08:00:00.000Z') s
         |LEFT JOIN (SELECT explode(Patient) AS p FROM $db.patient
         |           WHERE timestamp < '2023-04-02') t
         |  ON s.p.id = t.p.id""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "pat-maggie")
    assert(rows.head.getString(1) == "N") // first sighting: not yet in target
  }

  test("OMOP person projection (ref :468-484)") {
    setup
    val bundles = BundleReader.readFromDirectory(spark, adtDir).entry()
    val carl = Flatten.omopPerson(bundles)
      .filter(col("person_id") === "pat-carl").collect().head
    assert(carl.getAs[Int]("year_of_birth") == 1960)
    assert(carl.getAs[Int]("month_of_birth") == 5)
    assert(carl.getAs[Int]("day_of_birth") == 6)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("graft_fhir_pivot is callable from pure SQL") {
    graft.functions.GraftFunctions.register(spark)
    val registry = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("Patient",
        FhirSchemas.Patient)))
    spark.read.option("wholetext", value = true).text(adtDir)
      .createOrReplaceTempView("raw_bundles")
    val rows = spark.sql(
      s"""SELECT p.id AS patient_id
         |FROM (SELECT graft_fhir_pivot(value, '${registry.json}') AS piv
         |      FROM raw_bundles)
         |LATERAL VIEW explode(piv.Patient) AS p
         |ORDER BY patient_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.contains("pat-carl"))
  }
}
