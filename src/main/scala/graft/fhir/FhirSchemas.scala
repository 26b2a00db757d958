package graft.fhir

import org.apache.spark.sql.types._

/** Declared (not inferred) FHIR resource schemas — the schema-registry
  * pattern of the reference's FhirSchemaModel
  * (ref: 01_dbignite_sample.py:16,141-146): FHIR JSON is too polymorphic for
  * inference, so every bundle row gets an identical declared shape, nullable
  * everywhere (resources appear with wildly different field subsets per
  * message — e.g. Practitioner is full in ADT_A01 but resourceType-only in
  * ADT_A28).
  *
  * Shared FHIR datatypes (Coding, CodeableConcept, Identifier, …) are
  * single definitions reused across resources.
  */
object FhirSchemas {

  private def field(n: String, t: DataType) = StructField(n, t, nullable = true)

  val coding: ArrayType = ArrayType(StructType(Seq(
    field("code", StringType),
    field("system", StringType),
    field("display", StringType))))

  val codeableConcept: StructType = StructType(Seq(
    field("text", StringType),
    field("coding", coding)))

  val identifier: ArrayType = ArrayType(StructType(Seq(
    field("use", StringType),
    field("type", codeableConcept),
    field("system", StringType),
    field("value", StringType))))

  val humanName: ArrayType = ArrayType(StructType(Seq(
    field("use", StringType),
    field("text", StringType),
    field("family", StringType),
    field("given", ArrayType(StringType)),
    field("suffix", ArrayType(StringType)))))

  val address: ArrayType = ArrayType(StructType(Seq(
    field("use", StringType),
    field("type", StringType),
    field("line", ArrayType(StringType)),
    field("city", StringType),
    field("district", StringType),
    field("state", StringType),
    field("country", StringType))))

  val contactPoint: ArrayType = ArrayType(StructType(Seq(
    field("system", StringType),
    field("value", StringType),
    field("use", StringType))))

  val reference: StructType = StructType(Seq(
    field("reference", StringType),
    field("type", StringType),
    field("display", StringType)))

  val extension: ArrayType = ArrayType(StructType(Seq(
    field("url", StringType),
    field("valueString", StringType),
    field("extension", ArrayType(StructType(Seq(
      field("url", StringType),
      field("valueString", StringType))))))))

  val Patient: StructType = StructType(Seq(
    field("id", StringType),
    field("identifier", identifier),
    field("name", humanName),
    field("active", BooleanType),
    field("gender", StringType),
    field("birthDate", StringType),
    field("deceasedBoolean", BooleanType),
    field("address", address),
    field("telecom", contactPoint),
    field("maritalStatus", codeableConcept),
    field("communication", ArrayType(StructType(Seq(
      field("language", codeableConcept))))),
    field("extension", extension)))

  val MessageHeader: StructType = StructType(Seq(
    field("id", StringType),
    field("eventCoding", StructType(Seq(
      field("system", StringType),
      field("code", StringType),
      field("display", StringType)))),
    field("definition", StringType),
    field("source", StructType(Seq(
      field("name", StringType),
      field("endpoint", StringType)))),
    field("focus", ArrayType(reference)),
    field("sender", reference),
    field("responsible", StructType(Seq(field("display", StringType))))))

  val Condition: StructType = StructType(Seq(
    field("id", StringType),
    field("clinicalStatus", codeableConcept),
    field("code", codeableConcept),
    field("subject", reference),
    field("recordedDate", StringType)))

  val Claim: StructType = StructType(Seq(
    field("id", StringType),
    field("status", StringType),
    field("patient", StringType),
    field("provider", StringType),
    field("type", codeableConcept),
    field("insurance", ArrayType(StructType(Seq(
      field("coverage", StringType))))),
    field("total", StructType(Seq(field("value", DoubleType)))),
    field("item", ArrayType(StructType(Seq(
      field("productOrService", codeableConcept)))))))

  val MedicationRequest: StructType = StructType(Seq(
    field("id", StringType),
    field("status", StringType),
    field("intent", StringType),
    field("authoredOn", StringType),
    field("requester", StringType),
    field("subject", reference)))

  val Practitioner: StructType = StructType(Seq(
    field("id", StringType),
    field("identifier", identifier),
    field("name", humanName),
    field("active", BooleanType),
    field("gender", StringType),
    field("telecom", contactPoint)))

  val Encounter: StructType = StructType(Seq(
    field("id", StringType),
    field("status", StringType),
    field("class", StructType(Seq(
      field("system", StringType),
      field("code", StringType)))),
    field("subject", reference),
    field("participant", ArrayType(StructType(Seq(
      field("individual", reference))))),
    field("location", ArrayType(StructType(Seq(
      field("location", reference))))),
    field("account", ArrayType(reference))))

  val Coverage: StructType = StructType(Seq(
    field("id", StringType),
    field("status", StringType),
    field("beneficiary", reference),
    field("payor", ArrayType(reference)),
    field("subscriberId", StringType)))

  val Location: StructType = StructType(Seq(
    field("id", StringType),
    field("name", StringType),
    field("status", StringType),
    field("address", StructType(Seq(
      field("line", ArrayType(StringType)),
      field("city", StringType),
      field("state", StringType))))))

  val Organization: StructType = StructType(Seq(
    field("id", StringType),
    field("name", StringType),
    field("active", BooleanType),
    field("type", ArrayType(codeableConcept))))

  val Account: StructType = StructType(Seq(
    field("id", StringType),
    field("status", StringType),
    field("subject", ArrayType(reference))))

  val RelatedPerson: StructType = StructType(Seq(
    field("id", StringType),
    field("patient", reference),
    field("name", humanName),
    field("relationship", ArrayType(codeableConcept)),
    field("telecom", contactPoint)))

  val CareTeam: StructType = StructType(Seq(
    field("id", StringType),
    field("status", StringType),
    field("subject", reference),
    field("participant", ArrayType(StructType(Seq(
      field("member", reference)))))))

  /** resourceType → declared struct, the default registry contents. */
  val defaultResourceMap: Map[String, StructType] = Map(
    "Patient" -> Patient,
    "MessageHeader" -> MessageHeader,
    "Condition" -> Condition,
    "Claim" -> Claim,
    "MedicationRequest" -> MedicationRequest,
    "Practitioner" -> Practitioner,
    "Encounter" -> Encounter,
    "Coverage" -> Coverage,
    "Location" -> Location,
    "Organization" -> Organization,
    "Account" -> Account,
    "RelatedPerson" -> RelatedPerson,
    "CareTeam" -> CareTeam)

}

/** Runtime-extensible schema registry, mirroring the reference's
  * FhirSchemaModel(fhir_resource_map=...) copy-with-override constructor
  * (ref: 01_dbignite_sample.py:123-146 — the notebook grafts a non-standard
  * `medicationCodeableConcept` into MedicationRequest and re-reads).
  */
final case class FhirSchemaModel(
    resourceMap: Map[String, StructType] = FhirSchemas.defaultResourceMap) {

  /** Replace (or add) a whole resource schema. */
  def withResource(resourceType: String, schema: StructType): FhirSchemaModel =
    copy(resourceMap = resourceMap + (resourceType -> schema))

  /** Add a field to an existing resource schema — the reference's
    * StructType.add pattern one level below the array element. */
  def withFieldAdded(
      resourceType: String, name: String, t: DataType): FhirSchemaModel = {
    val base = resourceMap(resourceType)
    withResource(resourceType,
      StructType(base.fields :+ StructField(name, t, nullable = true)))
  }

  /** Bundle-shaped schema that parses ONLY the given resource type's
    * entries: entry[].resource carries resourceType (the filter
    * discriminator) + that resource's declared fields. Per-resource parses
    * avoid the name-collision lossiness of a merged union schema (see
    * BundleReader scaladoc). */
  def entrySchemaFor(resourceType: String): StructType = {
    val resource = StructType(
      StructField("resourceType", StringType, nullable = true) +:
        resourceMap(resourceType).fields)
    StructType(Seq(
      StructField("timestamp", StringType, nullable = true),
      StructField("entry", ArrayType(StructType(Seq(
        StructField("resource", resource, nullable = true)))),
        nullable = true)))
  }
}
