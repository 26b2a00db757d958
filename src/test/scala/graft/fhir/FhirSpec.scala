package graft.fhir

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark

class FhirSpec extends AnyFunSuite {

  private val adtDir = getClass.getResource("/adt").getPath
  private lazy val bundles =
    BundleReader.readFromDirectory(spark, adtDir).entry()

  test("entry() yields one row per bundle with per-resource array columns") {
    assert(bundles.count() == 4)
    val cols = bundles.columns.toSet
    assert(Set("bundleUUID", "timestamp", "Patient", "MessageHeader",
      "Encounter", "Practitioner", "Location", "Coverage").subsetOf(cols))
    val a01 = bundles
      .filter(col("timestamp") === "2023-03-30T13:38:48.516Z")
      .collect().head
    assert(a01.getAs[scala.collection.Seq[_]]("Location").size == 5)
    assert(a01.getAs[scala.collection.Seq[_]]("Coverage").size == 2)
    assert(a01.getAs[scala.collection.Seq[_]]("Patient").size == 1)
  }

  test("bundleUUIDs are unique per bundle") {
    val ids = bundles.select("bundleUUID").collect().map(_.getString(0))
    assert(ids.distinct.length == 4)
    assert(ids.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }

  test("patient flatten surfaces the documented identifier values") {
    val carl = Flatten.patients(bundles)
      .filter(col("patient_id") === "pat-carl"
        && col("timestamp") === "2023-03-30T13:38:48.516Z")
      .collect().head
    assert(carl.getAs[String]("ssn") == "555-55-5555")
    assert(carl.getAs[String]("drivers_license") == "123456789driver1")
    assert(carl.getAs[String]("empi_id") == "123456")
    assert(carl.getAs[String]("first_name") == "Carl")
    assert(carl.getAs[String]("last_name") == "Carlson")
    assert(carl.getAs[String]("birth_date") == "1960-05-06")
    assert(carl.getAs[String]("gender") == "male")
  }

  test("permissive nullability: resourceType-only Practitioner parses") {
    val a28 = bundles.filter(col("timestamp") === "2023-04-02T08:00:00.000Z")
    val prs = Flatten.practitioners(a28).collect()
    assert(prs.length == 1)
    assert(prs.head.getAs[String]("practitioner_id") == null)
  }

  test("adt patient events join + decode + order") {
    val events = Flatten.adtPatientEvents(bundles).collect()
    assert(events.length == 4)
    // ordered ssn desc → Maggie (666-...) first, then Carl
    assert(events.head.getAs[String]("ssn") == "666-66-6666")
    val byCode = events.map(e =>
      e.getAs[String]("event_code") -> e.getAs[String]("action")).toMap
    assert(byCode("ADT_A01") == "admit")
    assert(byCode("ADT_A28") == "create_person")
    assert(byCode("ADT_A31") == "update_person")
    assert(byCode("ADT_A09") == "track_departure")
    // Carl's two events ordered timestamp desc within same ssn
    val carls = events.filter(_.getAs[String]("ssn") == "555-55-5555")
    assert(carls.map(_.getAs[String]("event_code")).toSeq
      == Seq("ADT_A09", "ADT_A01"))
  }

  test("get_action SQL UDF returns named struct fields") {
    AdtActions.register(spark)
    val row = spark.sql(
      "SELECT get_action('ADT_A03').action AS a, " +
        "get_action('ADT_A03').description AS d").collect().head
    assert(row.getString(0) == "discharge")
    assert(row.getString(1) == "Discharge/end visit")
    assert(spark.sql("SELECT get_action('NOPE') IS NULL AS n")
      .collect().head.getBoolean(0))
  }

  test("patient conditions flatten") {
    val pc = Flatten.patientConditions(bundles).collect()
    assert(pc.length == 1)
    assert(pc.head.getAs[String]("condition_code") == "10509002")
    assert(pc.head.getAs[String]("clinical_status") == "active")
    assert(pc.head.getAs[String]("patient_id") == "pat-carl")
  }

  test("schema override: non-standard medicationCodeableConcept (ref :123-146)") {
    import spark.implicits._
    val json = Seq(
      """{"resourceType":"Bundle","type":"collection","entry":[
        |{"resource":{"resourceType":"MedicationRequest","id":"mr1",
        |"status":"active","intent":"order",
        |"medicationCodeableConcept":{"text":"Aspirin 81mg",
        |"coding":[{"code":"243670","system":"rxnorm"}]}}}]}"""
        .stripMargin.replace("\n", "")).toDS()
    // default registry: field absent
    val defaultDf = BundleReader.fromJsonStrings(json)
    assert(!defaultDf.select(explode(col("MedicationRequest")).as("m"))
      .select("m.*").columns.contains("medicationCodeableConcept"))
    // overridden registry: field present and populated
    val model = FhirSchemaModel().withFieldAdded(
      "MedicationRequest", "medicationCodeableConcept",
      FhirSchemas.codeableConcept)
    val df = BundleReader.fromJsonStrings(json, model)
    val m = df.select(explode(col("MedicationRequest")).as("m"))
      .select(col("m.medicationCodeableConcept.text").as("t"),
        col("m.medicationCodeableConcept.coding").getItem(0)
          .getField("code").as("c"))
      .collect().head
    assert(m.getString(0) == "Aspirin 81mg")
    assert(m.getString(1) == "243670")
  }

  test("bulkTableWrite persists per-resource tables with shared bundleUUIDs") {
    val base = Files.createTempDirectory("graft_fhir_tables").toString
    val written = TableWriter.bulkTableWrite(bundles, "graft_fhir_test",
      columns = Seq("Patient", "MessageHeader", "Encounter"),
      basePath = Some(base))
    assert(written.toSet == Set("graft_fhir_test.patient",
      "graft_fhir_test.messageheader", "graft_fhir_test.encounter"))
    val p = spark.table("graft_fhir_test.patient")
    val mh = spark.table("graft_fhir_test.messageheader")
    assert(p.count() == 4 && mh.count() == 4)
    // same UUID universe across tables → join re-associates bundles
    val joined = p.join(mh, "bundleUUID")
    assert(joined.count() == 4)
    spark.sql("DROP DATABASE graft_fhir_test CASCADE")
  }

  test("malformed bundle JSON degrades to null columns, not a crash") {
    import graft.GraftSpark.spark.implicits._
    val mixed = Seq(
      """{"resourceType":"Bundle","timestamp":"2024-01-01T00:00:00Z",
        |"entry":[{"resource":{"resourceType":"Patient","id":"ok-1"}}]}"""
        .stripMargin.replace("\n", ""),
      """{"resourceType":"Bundle","entry": NOT VALID JSON""",
      """{"totally": "unrelated"}""").toDS()
    val df = BundleReader.fromJsonStrings(mixed)
    val rows = df.collect()
    assert(rows.length == 3) // every input row survives
    val patients = df
      .select(explode(col("Patient")).as("p")).select("p.id").collect()
    assert(patients.map(_.getString(0)).toSeq == Seq("ok-1"))
  }

  test("bulkTableWrite with ingest-date partitioning prunes on date filters") {
    val base = Files.createTempDirectory("graft_fhir_part").toString
    TableWriter.bulkTableWrite(bundles, "graft_fhir_part",
      columns = Seq("Patient"), basePath = Some(base),
      partitionByIngestDate = true)
    val p = spark.table("graft_fhir_part.patient")
      .filter(col("ingest_date") === "2023-03-30")
    p.collect()
    val plan = p.queryExecution.executedPlan.toString
    assert(p.count() == 1)
    assert(plan.contains("PartitionFilters: [isnotnull(ingest_date"),
      s"expected partition pruning:\n$plan")
    spark.sql("DROP DATABASE graft_fhir_part CASCADE")
  }
}
