package graft.fhir

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end run of the reference notebook's pipeline on the ADT fixtures:
  * read → entry() → flatten → ADT decode → inverse FHIR encode.
  * `sbt "runMain graft.fhir.Demo [adtDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val adtDir =
      if (args.nonEmpty) args(0) else "src/test/resources/adt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-fhir-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bundles = BundleReader.readFromDirectory(spark, adtDir).entry()
    println(s"== bundles: ${bundles.count()} rows ==")
    bundles.printSchema()

    println("== patients ==")
    Flatten.patients(bundles).show(truncate = false)

    println("== adt patient events ==")
    Flatten.adtPatientEvents(bundles).show(truncate = false)

    println("== patient conditions ==")
    Flatten.patientConditions(bundles).show(truncate = false)

    println("== inverse encode (df_to_fhir) ==")
    import spark.implicits._
    val flat = Seq(("P001", "1923-05-01", "CLM-1", "99213", "99214"))
      .toDF("DESYNPUF_ID", "BENE_BIRTH_DT", "CLM_ID", "HCPCS_1", "HCPCS_2")
    val mm = MappingManager(Seq(
      Mapping("DESYNPUF_ID", "Patient.id"),
      Mapping("BENE_BIRTH_DT", "Patient.birthDate"),
      Mapping("CLM_ID", "Claim.id"),
      Mapping("HCPCS_1", "Claim.procedure.procedureCodeableConcept.coding.code"),
      Mapping("HCPCS_2", "Claim.procedure.procedureCodeableConcept.coding.code")))
    FhirBundleWriter.dfToFhir(flat, mm).collect().foreach(println)
    spark.stop()
  }
}
