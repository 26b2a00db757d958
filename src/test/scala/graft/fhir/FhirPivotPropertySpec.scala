package graft.fhir

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSpark.spark

/** Fuzz properties for the hand-written token loop in FhirBundlePivot.
  *
  * 1. CLEAN bundles — shuffled field order (resourceType first OR buried),
  *    unknown junk FIELDS of every JSON shape, missing resource keys,
  *    unregistered types, empty objects — must equal the declarative
  *    envelope formulation row-for-row.
  * 2. Bundles with junk ENTRY ELEMENTS (null, scalars, nested arrays) must
  *    equal the expression's own output on the junk-stripped twin: the
  *    expression deliberately SKIPS junk elements where from_json's
  *    PERMISSIVE rule would null the whole entry array (see the
  *    FhirBundlePivot scaladoc), so the declarative path is not the
  *    baseline there — the clean twin is.
  *
  * Generated values are WELL-TYPED per the declared schemas (ill-typed
  * recovery is covered separately in FhirIngestSpec). Raw ScalaCheck Gen
  * with fixed seeds, same pattern as EncoderPropertySpec.
  */
class FhirPivotPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private val om = new ObjectMapper()

  private val word = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))

  /** Junk value of any JSON shape, for unknown fields both paths skip. */
  private def junkJson(depth: Int): Gen[String] =
    if (depth <= 0) Gen.oneOf(word.map("\"" + _ + "\""),
      Gen.choose(-999, 999).map(_.toString), Gen.const("null"),
      Gen.const("true"))
    else Gen.oneOf(
      junkJson(0),
      Gen.listOfN(2, junkJson(depth - 1)).map(_.mkString("[", ",", "]")),
      for { k <- word; v <- junkJson(depth - 1) } yield s"""{"$k":$v}""")

  /** Well-typed Patient resource with shuffled field order, optional junk
    * fields, and resourceType anywhere (exercises fast path + fallback). */
  private val patientGen: Gen[String] = for {
    id <- word
    gender <- Gen.oneOf("female", "male", "other")
    active <- Gen.oneOf(true, false)
    family <- word
    given1 <- word
    junkKey <- word.map("zz_" + _) // prefix avoids colliding with schema
    junkVal <- junkJson(2)
    withName <- Gen.oneOf(true, false)
    rtFirst <- Gen.oneOf(true, false)
  } yield {
    val fields = scala.collection.mutable.ListBuffer[String](
      s""""id":"$id"""", s""""gender":"$gender"""", s""""active":$active""",
      s""""$junkKey":$junkVal""")
    if (withName) fields +=
      s""""name":[{"family":"$family","given":["$given1"]}]"""
    val rt = s""""resourceType":"Patient""""
    val all = if (rtFirst) rt +: fields else (fields :+ rt).toSeq
    all.mkString("{", ",", "}")
  }

  private val locationGen: Gen[String] = for {
    id <- word; name <- word; rtFirst <- Gen.oneOf(true, false)
  } yield {
    val fields = Seq(s""""id":"$id"""", s""""name":"$name"""")
    val rt = s""""resourceType":"Location""""
    (if (rtFirst) rt +: fields else fields :+ rt).mkString("{", ",", "}")
  }

  private val unregisteredGen: Gen[String] =
    word.map(w => s"""{"resourceType":"Zzz$w","x":"$w"}""")

  /** Clean entry element: always a JSON object (possibly without a
    * resource, or with an empty/unregistered one). */
  private val cleanEntryGen: Gen[String] = Gen.frequency(
    5 -> patientGen.map(r => s"""{"resource":$r}"""),
    2 -> locationGen.map(r => s"""{"resource":$r}"""),
    1 -> unregisteredGen.map(r => s"""{"resource":$r}"""),
    1 -> Gen.const("""{"resource":{}}"""),
    1 -> Gen.const("""{"fullUrl":"urn:x"}"""))

  /** Junk entry element — shapes from_json's PERMISSIVE rule chokes on. */
  private val junkEntryGen: Gen[String] =
    Gen.oneOf(Gen.const("null"), Gen.const("7"), Gen.const("[1,2]"),
      word.map("\"" + _ + "\""))

  /** Timestamp VALUE of any JSON shape: the expression must replicate
    * from_json's StringType conversion for every one of these (strings via
    * getText, null as null, everything else re-serialized as JSON text). */
  private val tsValueGen: Gen[String] = Gen.oneOf(
    word.map("\"" + _ + "\""),
    Gen.const("null"),
    Gen.choose(0, 999999).map(_.toString),
    Gen.oneOf("true", "false"),
    word.map(w => s"""{"inner":"$w","n":3}"""),
    word.map(w => s"""["$w",7]"""))

  private def bundleGen(entryGen: Gen[String]): Gen[String] = for {
    n <- Gen.choose(0, 6)
    entries <- Gen.listOfN(n, entryGen)
    ts <- Gen.option(tsValueGen)
    junkKey <- word.map("zz_" + _)
    junkVal <- junkJson(2)
    entryFirst <- Gen.oneOf(true, false)
  } yield {
    val fields = scala.collection.mutable.ListBuffer[String]()
    val entry = s""""entry":[${entries.mkString(",")}]"""
    ts.foreach(t => fields += s""""timestamp":$t""")
    fields += s""""$junkKey":$junkVal"""
    val all = if (entryFirst) entry +: fields else (fields :+ entry).toSeq
    all.mkString("{", ",", "}")
  }

  private def batch(gen: Gen[String], seed: Long): Seq[String] = {
    val bundles = Gen.listOfN(12, gen)
      .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
    // generator retry exhaustion must fail loudly, not vacuously pass
    assert(bundles.size == 12, s"generator failed for seed $seed")
    bundles.foreach(om.readTree) // sanity: valid JSON
    bundles
  }

  private def pivotRows(bundles: Seq[String])(
      f: (org.apache.spark.sql.DataFrame, FhirSchemaModel) =>
        org.apache.spark.sql.DataFrame): Seq[String] = {
    val df = f(bundles.toDF("value"), FhirSchemaModel())
    df.drop("bundleUUID").collect().map(_.toString).sorted.toSeq
  }

  test("clean bundles: expression pivot equals envelope pivot (40 batches)") {
    (1 to 40).foreach { i =>
      val bundles = batch(bundleGen(cleanEntryGen), i.toLong)
      val a = pivotRows(bundles)(BundleReader.pivotEntries)
      val b = pivotRows(bundles)(BundleReader.pivotEntriesEnvelope)
      assert(a == b, s"seed $i diverged:\n expr=$a\n env =$b\n" +
        s" bundles=${bundles.mkString("\n")}")
    }
  }

  test("duplicate top-level entry/timestamp keys: last occurrence wins") {
    // Jackson's converter under from_json overwrites a field per key
    // occurrence, so the declarative baselines keep only the LAST 'entry'
    // array — the token loop must match (it resets its buckets on a
    // repeated key instead of accumulating across occurrences). One probed
    // exception: a NON-ARRAY non-null duplicate fails its ArrayType
    // conversion and from_json's permissive partial row RETAINS the
    // previous occurrence's value — the generator interleaves those too
    // (scalar / object / string / nested junk), anywhere in the key order.
    val nonArrayEntryGen: Gen[String] =
      Gen.oneOf(Gen.const("7"), word.map("\"" + _ + "\""),
        Gen.const("""{"a":1}"""), junkJson(1).suchThat(j =>
          !j.startsWith("[") && j != "null"))
    val dupBundleGen: Gen[String] = for {
      n1 <- Gen.choose(0, 3)
      n2 <- Gen.choose(0, 3)
      e1 <- Gen.listOfN(n1, cleanEntryGen)
      e2 <- Gen.listOfN(n2, cleanEntryGen)
      ts1 <- Gen.option(word)
      dupTsNull <- Gen.oneOf(true, false)
      junkEntry <- Gen.option(nonArrayEntryGen)
      junkPos <- Gen.choose(0, 2)
      dupEntryNull <- Gen.oneOf(true, false)
    } yield {
      val fields = scala.collection.mutable.ListBuffer[String]()
      ts1.foreach(t => fields += s""""timestamp":"$t"""")
      if (junkPos == 0) junkEntry.foreach(j => fields += s""""entry":$j""")
      fields += s""""entry":[${e1.mkString(",")}]"""
      if (dupTsNull && ts1.nonEmpty) fields += s""""timestamp":null"""
      if (junkPos == 1) junkEntry.foreach(j => fields += s""""entry":$j""")
      fields += s""""entry":[${e2.mkString(",")}]"""
      if (junkPos == 2) junkEntry.foreach(j => fields += s""""entry":$j""")
      if (dupEntryNull && junkPos != 2) fields += s""""entry":null"""
      fields.mkString("{", ",", "}")
    }
    (1 to 20).foreach { i =>
      val bundles = batch(dupBundleGen, 2000L + i)
      val a = pivotRows(bundles)(BundleReader.pivotEntries)
      val b = pivotRows(bundles)(BundleReader.pivotEntriesEnvelope)
      assert(a == b, s"seed $i diverged on duplicate keys:\n expr=$a\n" +
        s" env =$b\n bundles=${bundles.mkString("\n")}")
    }
  }

  test("junk entry elements: expression equals its junk-stripped twin") {
    val mixedEntry = Gen.frequency(3 -> cleanEntryGen, 2 -> junkEntryGen)
    (1 to 40).foreach { i =>
      val bundles = batch(bundleGen(mixedEntry), 1000L + i)
      // strip non-object entry elements via a Jackson rewrite
      val cleaned = bundles.map { b =>
        val root = om.readTree(b).asInstanceOf[ObjectNode]
        Option(root.get("entry")).filter(_.isArray).foreach { arr =>
          val kept = om.createArrayNode()
          arr.asInstanceOf[ArrayNode].forEach(e =>
            if (e.isObject) { kept.add(e); () })
          root.set[ObjectNode]("entry", kept)
        }
        om.writeValueAsString(root)
      }
      val a = pivotRows(bundles)(BundleReader.pivotEntries)
      val b = pivotRows(cleaned)(BundleReader.pivotEntries)
      assert(a == b, s"seed $i: junk elements changed surviving rows:\n" +
        s" raw=$a\n clean=$b\n bundles=${bundles.mkString("\n")}")
    }
  }
}
