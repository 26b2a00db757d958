package graft.fhir

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark

/** The DataSourceV2 connector (`format("graft-fhir")`) must be a drop-in
  * twin of `read_from_directory().entry()` — same rows, same schema —
  * while adding what a table source can: column pruning that reaches the
  * parser (visible in the scan's readSchema), size-aware file
  * bin-packing, and schema overrides through `.schema(…)`. */
class FhirSourceSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  private lazy val adtDir = getClass.getResource("/adt").getPath
  private val source = classOf[graft.sources.FhirBundleSource].getName

  test("short-name load equals entry() row-for-row (modulo bundleUUID)") {
    val viaSource = spark.read.format("graft-fhir").load(adtDir)
    val viaEntry = BundleReader.readFromDirectory(spark, adtDir).entry()
    assert(viaSource.schema == viaEntry.schema,
      s"schema drift:\n${viaSource.schema}\nvs\n${viaEntry.schema}")
    val a = viaSource.drop("bundleUUID").toJSON.collect().sorted
    val b = viaEntry.drop("bundleUUID").toJSON.collect().sorted
    assert(a.toSeq == b.toSeq)
    // minted ids: one per file, unique, UUID-shaped
    val ids = viaSource.select("bundleUUID").collect().map(_.getString(0))
    assert(ids.length == 4 && ids.distinct.length == 4)
    ids.foreach(id => assert(id.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"), id))
  }

  test("column pruning reaches the scan and the parse registry") {
    val df = spark.read.format(source).load(adtDir)
      .select("bundleUUID", "Patient")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScan leaf")
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("bundleUUID", "Patient"),
      s"pruning did not reach the scan: ${scans.head.scan.readSchema()}")
    // and the pruned read still decodes the requested column correctly
    val patients = df.select(explode(col("Patient.id")).as("id"))
      .collect().map(_.getString(0))
    assert(patients.length == 4 && patients.forall(_ != null))
  }

  test("resourceTypes option restricts schema up front") {
    val df = spark.read.format(source)
      .option("resourceTypes", "Patient,Encounter").load(adtDir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("bundleUUID", "timestamp", "Encounter", "Patient"))
    assert(df.count() == 4)
    val err = intercept[IllegalArgumentException] {
      spark.read.format(source)
        .option("resourceTypes", "Patient,NoSuchType").load(adtDir)
    }
    assert(err.getMessage.contains("NoSuchType"))
  }

  test("a user schema override flows through to the converters") {
    val narrow = StructType(Seq(
      StructField("bundleUUID", StringType, nullable = false),
      StructField("timestamp", StringType, nullable = true),
      StructField("Patient", ArrayType(StructType(Seq(
        StructField("id", StringType, nullable = true)))), nullable = true)))
    val rows = spark.read.format(source).schema(narrow).load(adtDir)
      .select(explode(col("Patient")).as("p")).select("p.*").collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.schema.fieldNames.toSeq == Seq("id")
      && r.getString(0) != null))
  }

  test("small files bin-pack into one input partition") {
    val df = spark.read.format(source).load(adtDir)
    assert(df.rdd.getNumPartitions == 1,
      s"4 small bundles should share one task, got " +
        s"${df.rdd.getNumPartitions}")
  }

  test("a malformed document keeps its row with null columns") {
    val dir = Files.createTempDirectory("fhir-src").toFile
    try {
      val good = new java.io.File(adtDir, "ADT_A01.json")
      Files.copy(good.toPath,
        new java.io.File(dir, "good.json").toPath)
      Files.writeString(
        new java.io.File(dir, "bad.json").toPath, "{not json at all")
      val rows = spark.read.format(source).load(dir.getAbsolutePath)
        .select("bundleUUID", "timestamp").collect()
      assert(rows.length == 2)
      assert(rows.count(_.isNullAt(1)) == 1,
        "exactly the malformed file should have a null timestamp")
      assert(rows.forall(_.getString(0) != null))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
