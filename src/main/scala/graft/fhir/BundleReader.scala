package graft.fhir

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FHIR bundle ingestion (ref: read_from_directory().entry() at
  * 01_dbignite_sample.py:20-26,145-146,355,416-422).
  *
  * Produces the bundle-row DataFrame of SURVEY.md §1.1: one row per bundle
  * file with
  *   bundleUUID string, timestamp string, <Resource> array<struct<…>> …
  *
  * Parsing strategy: one whole-file text scan, then one narrow-schema
  * `from_json` per registered resource type. FHIR resource structs share
  * field NAMES with different SHAPES (Patient.name is array<HumanName>,
  * Location.name is a string; Account.subject is an array, Condition.subject
  * a struct), so a single merged-schema parse is lossy by construction —
  * per-resource parses give every column its exact declared schema. The
  * JSON text is re-tokenized per resource type, but each pass materializes
  * only its own subtree (Jackson skips the rest), the scan itself happens
  * once, and the whole pivot stays shuffle-free — one task per file group
  * at 100 TB, no collect anywhere.
  */
final case class FhirBundleReader(
    spark: SparkSession,
    path: String,
    model: FhirSchemaModel = FhirSchemaModel()) {

  /** Lazy handle, nothing runs until an action — matches D1 semantics. */
  def entry(): DataFrame = entry(model)

  /** Materialize the bundle-row DataFrame, optionally with an overridden
    * schema registry (the reference's `entry(schemas=...)` argument). */
  def entry(schemas: FhirSchemaModel): DataFrame =
    BundleReader.pivotEntries(
      spark.read.option("wholetext", value = true).text(path)
        .select(col("value")),
      schemas)
}

object BundleReader {

  /** D1: capture the path; parsing happens at `entry()`. */
  def readFromDirectory(
      spark: SparkSession,
      path: String,
      model: FhirSchemaModel = FhirSchemaModel()): FhirBundleReader =
    FhirBundleReader(spark, path, model)

  /** Parse bundles already held as JSON strings (schema-override unit tests,
    * streaming sources, message queues). */
  def fromJsonStrings(
      json: Dataset[String],
      model: FhirSchemaModel = FhirSchemaModel()): DataFrame =
    pivotEntries(json.toDF("value"), model)

  /** Streaming entry point: same pivot over a streaming `value` column
    * (file-source text stream); used by graft.streaming.Streams. */
  def pivotStream(raw: DataFrame, model: FhirSchemaModel): DataFrame =
    pivotEntries(raw, model)

  /** Shared pivot over a one-JSON-document-per-row `value` column. */
  private[fhir] def pivotEntries(
      raw: DataFrame, model: FhirSchemaModel): DataFrame = {
    val resourceCols: Seq[Column] =
      model.resourceMap.keys.toSeq.sorted.map { rt =>
        val entrySchema = model.entrySchemaFor(rt)
        val parsed = from_json(col("value"), entrySchema)
        transform(
          filter(parsed.getField("entry"),
            e => e.getField("resource").getField("resourceType") === rt),
          e => dropResourceType(e.getField("resource"),
            model.resourceMap(rt))).as(rt)
      }
    raw.select(
      (expr("uuid()").as("bundleUUID") +:
        get_json_object(col("value"), "$.timestamp").as("timestamp") +:
        resourceCols): _*)
  }

  /** Project away the parse-time resourceType discriminator, keeping the
    * resource's declared fields. */
  private def dropResourceType(resource: Column, schema: StructType): Column =
    struct(schema.fieldNames.toSeq.map(n => resource.getField(n).as(n)): _*)
}
