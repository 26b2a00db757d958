package graft.fhir

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Inverse ETL: flat relational rows → FHIR bundle JSON strings
  * (ref: Mapping/FhirEncoderManager/MappingManager/df_to_fhir at
  * 01_dbignite_sample.py:497-548).
  *
  * Architecture deliberately differs from the reference (SURVEY.md §3 E3):
  * instead of per-row lambdas over an RDD (a JVM↔worker process boundary in
  * the original), the mapping list is compiled ONCE on the driver into a
  * Column expression tree — named_struct/array/to_json — so encoding runs
  * inside whole-stage codegen with zero extra boundaries. Override hooks
  * are Column→Column functions spliced into the tree at their path.
  */

/** Declares flat source column → dotted FHIR target path
  * (ref: 01_dbignite_sample.py:520-529). Repeating the same target path
  * appends: two HCPCS codes mapped to
  * `Claim.procedure.procedureCodeableConcept.coding.code` become two
  * procedure entries (ref: :524-528). */
final case class Mapping(src: String, fhirPath: String)

/** Per-path encoding override: receives the default-compiled Column for the
  * path (for repeated paths, the array of grouped source values — the
  * reference's lambdas receive the grouped intermediate, :532-539) and
  * returns the replacement. */
final case class FhirEncoder(encode: Column => Column)

/** Registry of per-path overrides (ref: FhirEncoderManager at :532-539). */
final case class FhirEncoderManager(
    overrideEncoders: Map[String, FhirEncoder] = Map.empty)

/** Compiles mappings against an input schema (driver-side)
  * (ref: MappingManager at :540). */
final case class MappingManager(
    maps: Seq[Mapping],
    em: FhirEncoderManager = FhirEncoderManager()) {

  /** Resource name → compiled struct Column. */
  private[fhir] def compileResources(): Seq[(String, Column)] = {
    val byResource = maps.groupBy(_.fhirPath.split('.').head)
    // preserve first-appearance order of resources
    val order = maps.map(_.fhirPath.split('.').head).distinct
    order.map { res =>
      val sub = byResource(res).map(m =>
        (m.fhirPath.split('.').toList.tail, m.src, m.fhirPath))
      val body = compileNode(sub, s"$res")
      res -> struct((lit(res).as("resourceType") +: body): _*)
    }
  }

  /** Recursively build the fields of one struct level.
    * `paths` = (remaining segments, source column, full target path). */
  private def compileNode(
      paths: Seq[(List[String], String, String)],
      prefix: String): Seq[Column] = {
    val bySegment = paths.groupBy(_._1.head)
    paths.map(_._1.head).distinct.map { seg =>
      val here = bySegment(seg)
      val fullPath = s"$prefix.$seg"
      val leaves = here.filter(_._1.tail.isEmpty)
      val deeper = here.filter(_._1.tail.nonEmpty)
      val built: Column =
        if (deeper.isEmpty) {
          // leaf level: repeated targets group into an array
          val cols = leaves.map(l => col(l._2))
          if (cols.size > 1) array(cols: _*) else cols.head
        } else if (leaves.isEmpty) {
          val rest = deeper.map(d => (d._1.tail, d._2, d._3))
          // repetition below: identical remaining paths → one array element
          // per mapping occurrence (the append semantics of :524-528)
          val restPaths = rest.map(_._1)
          if (rest.size > 1 && restPaths.distinct.size == 1)
            array(rest.map(r =>
              struct(compileNode(Seq(r), fullPath): _*)): _*)
          else
            struct(compileNode(rest, fullPath): _*)
        } else
          throw new IllegalArgumentException(
            s"path $fullPath is both leaf and branch")
      em.overrideEncoders.get(fullPath)
        .fold(built)(enc => enc.encode(built))
        .as(seg)
    }
  }
}

/** df_to_fhir: one FHIR bundle JSON string per input row
  * (ref: Bundle(m).df_to_fhir(data) at :542,594-596). */
object FhirBundleWriter {

  def dfToFhir(df: DataFrame, mm: MappingManager): Dataset[String] = {
    // Different resources have different struct types, so the entry list
    // cannot be one typed array Column; each entry is serialized on its own
    // and the bundle is assembled textually — still a single codegen'd
    // projection, no RDD.
    val entryJsons = mm.compileResources().map { case (_, resourceStruct) =>
      to_json(struct(resourceStruct.as("resource")))
    }
    val bundle = concat(
      lit("""{"resourceType":"Bundle","type":"collection","entry":["""),
      concat_ws(",", entryJsons: _*),
      lit("]}"))
    val spark = df.sparkSession
    import spark.implicits._
    df.select(bundle.as("fhir_json")).as[String]
  }
}
