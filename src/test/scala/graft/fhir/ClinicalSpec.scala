package graft.fhir

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark

/** The clinical (non-ADT) analysis paths of the reference notebook:
  * claims (ref :82-94), medications under the schema override (ref
  * :151-160), and the provider join on the URL-embedded UUID (ref
  * :326-333). */
class ClinicalSpec extends AnyFunSuite {

  private val dir = getClass.getResource("/clinical").getPath
  private val model = FhirSchemaModel().withFieldAdded(
    "MedicationRequest", "medicationCodeableConcept",
    FhirSchemas.codeableConcept)
  private lazy val bundles =
    BundleReader.readFromDirectory(spark, dir, model).entry()

  test("claims flatten surfaces billed amount and item code") {
    val c = Flatten.claims(bundles).collect().head
    assert(c.getAs[String]("claim_id") == "claim-100")
    assert(c.getAs[Double]("claim_billed_amount") == 1250.5)
    assert(c.getAs[String]("claim_type") == "institutional")
    assert(c.getAs[String]("first_item_code") == "99213")
  }

  test("medications flatten under the schema override") {
    val m = Flatten.medications(bundles).collect().head
    assert(m.getAs[String]("medication_text") == "Amoxicillin 500 MG")
    assert(m.getAs[String]("medication_code") == "308182")
    assert(m.getAs[String]("status") == "active")
  }

  test("claim ⋈ practitioner via fixed-offset provider UUID (ref :329)") {
    val rows = Flatten.claimProviders(bundles).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("provider_uuid")
      == "7f4a1b2c-3d5e-4f60-8a9b-0c1d2e3f4a5b")
    assert(r.getAs[String]("last_name") == "Rivera")
    assert(r.getAs[Boolean]("active"))
  }

  test("regexp variant extracts the same uuid as the fixed offset") {
    val c = Flatten.claims(bundles)
      .select(
        Flatten.refUuidFixedOffset(col("provider_ref")).as("fixed"),
        Flatten.refUuidRegexp(col("provider_ref")).as("re"))
      .collect().head
    assert(c.getString(0) == c.getString(1))
  }
}
