package graft.fhir

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark

class FhirEncodingSpec extends AnyFunSuite {
  import spark.implicits._

  // CMS SynPUF-shaped flat input (ref: 01_dbignite_sample.py:501-516)
  private lazy val flat = Seq(
    ("P001", "1923-05-01", "CLM-1", "99213", "99214", "4019,2724"),
    ("P002", "1943-01-01", "CLM-2", "99215", "99213", "25000")
  ).toDF("DESYNPUF_ID", "BENE_BIRTH_DT", "CLM_ID",
    "HCPCS_CD_1", "HCPCS_CD_2", "ICD9_DGNS_CDS")

  private val maps = Seq(
    Mapping("DESYNPUF_ID", "Patient.id"),
    Mapping("BENE_BIRTH_DT", "Patient.birthDate"),
    Mapping("CLM_ID", "Claim.id"),
    Mapping("HCPCS_CD_1", "Claim.procedure.procedureCodeableConcept.coding.code"),
    Mapping("HCPCS_CD_2", "Claim.procedure.procedureCodeableConcept.coding.code"),
    Mapping("ICD9_DGNS_CDS", "Claim.diagnosis"))

  // override: split comma-joined ICD9 codes into [{code, system}] —
  // the reference's FhirEncoder lambda (ref: :532-539)
  private val em = FhirEncoderManager(Map(
    "Claim.diagnosis" -> FhirEncoder(c =>
      transform(split(c, ","), code =>
        struct(code.as("code"), lit("http://hl7.org/fhir/sid/icd-9-cm")
          .as("system"))))))

  test("df_to_fhir emits one bundle JSON per row, inside codegen") {
    val out = FhirBundleWriter.dfToFhir(flat, MappingManager(maps, em))
    val rows = out.collect()
    assert(rows.length == 2)
    rows.foreach(j => assert(j.startsWith("""{"resourceType":"Bundle"""")))
  }

  test("repeated target paths append: two HCPCS → two procedure entries") {
    val out = FhirBundleWriter.dfToFhir(flat, MappingManager(maps, em))
    val ddl = "entry ARRAY<STRUCT<resource: STRUCT<resourceType: STRING, " +
      "id: STRING, procedure: ARRAY<STRUCT<procedureCodeableConcept: " +
      "STRUCT<coding: STRUCT<code: STRING>>>>>>>"
    val parsed = out.toDF("j")
      .select(from_json(col("j"), StructType.fromDDL(ddl)).as("b"))
      .select(explode(col("b.entry")).as("e"))
      .filter(col("e.resource.resourceType") === "Claim")
      .select(col("e.resource.id").as("claim_id"),
        col("e.resource.procedure").as("procs"))
      .collect()
    val byClaim = parsed.map(r => r.getAs[String]("claim_id") ->
      r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("procs")
        .map(_.getStruct(0).getStruct(0).getString(0)).toSeq).toMap
    assert(byClaim("CLM-1") == Seq("99213", "99214"))
    assert(byClaim("CLM-2") == Seq("99215", "99213"))
  }

  test("override encoder splits grouped codes into typed structs") {
    val out = FhirBundleWriter.dfToFhir(flat, MappingManager(maps, em))
    val first = out.filter(_.contains(""""id":"CLM-1"""")).collect().head
    assert(first.contains(
      """"diagnosis":[{"code":"4019","system":"http://hl7.org/fhir/sid/icd-9-cm"},""" +
        """{"code":"2724","system":"http://hl7.org/fhir/sid/icd-9-cm"}]"""))
  }

  test("round trip: values survive encode → parse") {
    val out = FhirBundleWriter.dfToFhir(flat, MappingManager(maps, em))
    val ddl = "entry ARRAY<STRUCT<resource: STRUCT<resourceType: STRING, " +
      "id: STRING, birthDate: STRING>>>"
    val patients = out.toDF("j")
      .select(from_json(col("j"), StructType.fromDDL(ddl)).as("b"))
      .select(explode(col("b.entry")).as("e"))
      .filter(col("e.resource.resourceType") === "Patient")
      .select(col("e.resource.id"), col("e.resource.birthDate"))
      .as[(String, String)].collect().toMap
    assert(patients == Map("P001" -> "1923-05-01", "P002" -> "1943-01-01"))
  }

  test("plan stays in Catalyst: no RDD boundary in the encoder") {
    val out = FhirBundleWriter.dfToFhir(flat, MappingManager(maps, em))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"), s"unexpected RDD/func boundary:\n$plan")
  }
}
