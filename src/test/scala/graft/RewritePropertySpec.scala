package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
  StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DoubleDot

/** Fuzz property for the DotProductRewrite optimizer rule: on arbitrary
  * double arrays — mismatched lengths, null elements, null arrays, empty
  * arrays, NaN/±0.0 values — the rewritten plan must produce EXACTLY what
  * the un-rewritten HOF chain produces (same nulls, bitwise-same doubles).
  * The base session evaluates the HOF reference (no rule registered
  * there); the extended session evaluates the rewritten plan. Raw
  * ScalaCheck Gen with a fixed seed, same pattern as the FHIR property
  * suites. */
class RewritePropertySpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("a", ArrayType(DoubleType, containsNull = true),
      nullable = true),
    StructField("b", ArrayType(DoubleType, containsNull = true),
      nullable = true)))

  private val value: Gen[java.lang.Double] = Gen.frequency(
    8 -> Gen.choose(-1e6, 1e6).map(java.lang.Double.valueOf),
    1 -> Gen.oneOf(Seq(0.0, -0.0, Double.NaN, 1e308, -1e308)
      .map(java.lang.Double.valueOf)),
    1 -> Gen.const(null: java.lang.Double))

  private def arr(len: Int): Gen[Seq[java.lang.Double]] =
    Gen.listOfN(len, value)

  private val rowGen: Gen[(Seq[java.lang.Double], Seq[java.lang.Double])] =
    for {
      la <- Gen.choose(0, 6)
      sameLen <- Gen.frequency(4 -> Gen.const(true), 1 -> Gen.const(false))
      lb <- if (sameLen) Gen.const(la) else Gen.choose(0, 6)
      a <- arr(la)
      b <- arr(lb)
      aNull <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
      bNull <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
    } yield (if (aNull) null else a, if (bNull) null else b)

  /** Reference fold, written directly from the HOF semantics: zip_with
    * pads the shorter side with null; null * x = null; null + acc = null;
    * fold seed 0.0. */
  private def reference(
      a: Seq[java.lang.Double], b: Seq[java.lang.Double]): Option[Double] = {
    if (a == null || b == null) return None
    val n = math.max(a.length, b.length)
    var acc: java.lang.Double = java.lang.Double.valueOf(0.0)
    for (i <- 0 until n) {
      val x = if (i < a.length) a(i) else null
      val y = if (i < b.length) b(i) else null
      val prod: java.lang.Double =
        if (x == null || y == null) null
        else java.lang.Double.valueOf(x.doubleValue * y.doubleValue)
      acc = if (acc == null || prod == null) null
        else java.lang.Double.valueOf(acc.doubleValue + prod.doubleValue)
    }
    Option(acc).map(_.doubleValue)
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("rewritten plan equals the HOF chain on fuzzed arrays") {
    val base = GraftSpark.spark
    val s2 = GraftSpark.extendedSpark
    val seed = Seed(20260812L)
    val cases = Gen.listOfN(300, rowGen)
      .apply(Gen.Parameters.default, seed).get
    val rows = cases.zipWithIndex.map { case ((a, b), i) =>
      Row(i.toLong, a, b)
    }
    val hof =
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d," +
        " (acc, v) -> acc + v)"
    // through parquet, not a LocalRelation: ConvertToLocalRelation would
    // constant-evaluate the projection before the optimized plan can be
    // inspected (and before the rewritten expression ever runs codegen)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rewrite_fuzz").toString
    base.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .write.mode("overwrite").parquet(dir)
    def run(s: org.apache.spark.sql.SparkSession): Map[Long, Option[Long]] = {
      s.read.parquet(dir).createOrReplaceTempView("fuzz_vecs")
      val out = s.sql(s"SELECT id, $hof AS dot FROM fuzz_vecs")
      if (s eq s2) {
        assert(out.queryExecution.optimizedPlan.expressions
          .exists(_.exists(_.isInstanceOf[DoubleDot])),
          "rule must fire on the fuzz query")
      }
      out.collect().map { r =>
        r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(bits(r.getDouble(1))))
      }.toMap
    }
    val expected = run(base)
    val got = run(s2)
    assert(got.size == cases.length && expected.size == cases.length)
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val ref = reference(a, b).map(bits)
      assert(expected(i.toLong) == ref,
        s"HOF reference mismatch at $i: a=$a b=$b")
      assert(got(i.toLong) == ref,
        s"rewrite diverged at $i: a=$a b=$b got=${got(i.toLong)} ref=$ref")
    }
  }
}
