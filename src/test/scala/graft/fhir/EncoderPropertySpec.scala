package graft.fhir

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark

/** SURVEY.md §5: ScalaCheck round-trip property for the FHIR encoder —
  * arbitrary flat rows → df_to_fhir JSON → parse back = original values.
  * (Raw ScalaCheck Gen with fixed seeds — the scalatest bridge isn't in
  * the offline dependency set.) */
class EncoderPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private val idGen = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12))
  private val dateGen = for {
    y <- Gen.choose(1900, 2020); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
  } yield f"$y%04d-$m%02d-$d%02d"
  private val rowsGen = Gen.nonEmptyListOf(for {
    pid <- idGen; bd <- dateGen; clm <- idGen
    h1 <- Gen.numStr.suchThat(_.nonEmpty).map(_.take(5))
    h2 <- Gen.numStr.suchThat(_.nonEmpty).map(_.take(5))
  } yield (pid, bd, clm, h1, h2)).map(_.distinctBy(_._1).take(8))

  private val maps = Seq(
    Mapping("DESYNPUF_ID", "Patient.id"),
    Mapping("BENE_BIRTH_DT", "Patient.birthDate"),
    Mapping("CLM_ID", "Claim.id"),
    Mapping("HCPCS_1", "Claim.procedure.procedureCodeableConcept.coding.code"),
    Mapping("HCPCS_2", "Claim.procedure.procedureCodeableConcept.coding.code"))

  test("encode → parse round trip preserves all mapped values") {
    val params = Gen.Parameters.default
    (1L to 10L).foreach { seed =>
      val rows = rowsGen.apply(params, Seed(seed)).getOrElse(Nil)
      if (rows.nonEmpty) {
        val df = rows.toDF(
          "DESYNPUF_ID", "BENE_BIRTH_DT", "CLM_ID", "HCPCS_1", "HCPCS_2")
        val out = FhirBundleWriter.dfToFhir(df, MappingManager(maps))
        val ddl = "entry ARRAY<STRUCT<resource: STRUCT<resourceType: STRING," +
          " id: STRING, birthDate: STRING, procedure: ARRAY<STRUCT<" +
          "procedureCodeableConcept: STRUCT<coding: STRUCT<code: STRING>>>>>>>"
        val parsed = out.toDF("j")
          .select(from_json(col("j"), StructType.fromDDL(ddl)).as("b"))
          .select(
            element_at(filter(col("b.entry"),
              e => e.getField("resource").getField("resourceType")
                === "Patient"), 1).getField("resource").as("p"),
            element_at(filter(col("b.entry"),
              e => e.getField("resource").getField("resourceType")
                === "Claim"), 1).getField("resource").as("c"))
          .select(
            col("p.id"), col("p.birthDate"), col("c.id"),
            col("c.procedure").getItem(0)
              .getField("procedureCodeableConcept").getField("coding")
              .getField("code"),
            col("c.procedure").getItem(1)
              .getField("procedureCodeableConcept").getField("coding")
              .getField("code"))
          .as[(String, String, String, String, String)]
          .collect().toSet
        assert(parsed == rows.toSet, s"seed $seed")
      }
    }
  }
}
