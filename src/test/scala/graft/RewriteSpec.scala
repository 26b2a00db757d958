package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DoubleDot

/** The injected optimizer rule must turn the declarative HOF dot-product
  * idiom into the codegen'd DoubleDot — bit-equal results, HOF null
  * semantics preserved — and must NOT fire on anything else.
  *
  * Inputs are built over `range()` so they are not constant-foldable:
  * literal arrays would be evaluated away by ConvertToLocalRelation
  * before the plan can be inspected. */
class RewriteSpec extends AnyFunSuite {

  private lazy val s2: SparkSession = GraftSpark.extendedSpark

  private def hasDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DoubleDot]))

  test("HOF dot product rewrites to DoubleDot with identical results") {
    val q = s2.sql(
      """SELECT id, aggregate(
        |  zip_with(array(id + 0.5d, id * 2.0d, 3.0d),
        |           array(id - 1.5d, 4.0d, id + 0.25d),
        |           (x, y) -> x * y),
        |  0.0d, (acc, v) -> acc + v) AS dot
        |FROM range(64)""".stripMargin)
    assert(hasDot(q), "rule must fire on the canonical idiom")
    val got = q.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 64L).foreach { id =>
      val a = Array(id + 0.5, id * 2.0, 3.0)
      val b = Array(id - 1.5, 4.0, id + 0.25)
      val expected =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(got(id) == expected, s"id=$id")
    }
    // operand order flipped: still commutative, still fires
    assert(hasDot(s2.sql(
      "SELECT aggregate(zip_with(array(id + 0.0d), array(2.0d)," +
        " (x, y) -> y * x), 0.0d, (acc, v) -> v + acc) AS dot" +
        " FROM range(4)")))
  }

  test("rewrite preserves HOF null semantics") {
    // mismatched lengths: zip_with pads with null, the fold propagates it
    val mism = s2.sql(
      "SELECT aggregate(zip_with(array(id + 1.0d, 2.0d), array(3.0d)," +
        " (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS dot" +
        " FROM range(1)")
    assert(hasDot(mism))
    assert(mism.head.isNullAt(0), "length mismatch must yield null")
    // a null element nulls the result
    val nel = s2.sql(
      "SELECT aggregate(zip_with(array(id + 1.0d, CAST(NULL AS DOUBLE))," +
        " array(3.0d, 4.0d), (x, y) -> x * y), 0.0d," +
        " (acc, v) -> acc + v) AS dot FROM range(1)")
    assert(hasDot(nel))
    assert(nel.head.isNullAt(0), "null element must yield null")
    // empty arrays return the seed
    val empty = s2.sql(
      "SELECT aggregate(zip_with(slice(array(id + 1.0d), 1, 0)," +
        " slice(array(2.0d), 1, 0), (x, y) -> x * y), 0.0d," +
        " (acc, v) -> acc + v) AS dot FROM range(1)")
    assert(empty.head.getDouble(0) == 0.0)
  }

  test("rule does not fire on non-dot folds") {
    // different seed: the fold is not a plain dot product
    assert(!hasDot(s2.sql(
      "SELECT aggregate(zip_with(array(id + 1.0d), array(2.0d)," +
        " (x, y) -> x * y), 1.0d, (acc, v) -> acc + v) AS x" +
        " FROM range(4)")))
    // addition inside zip_with: not a product
    assert(!hasDot(s2.sql(
      "SELECT aggregate(zip_with(array(id + 1.0d), array(2.0d)," +
        " (x, y) -> x + y), 0.0d, (acc, v) -> acc + v) AS x" +
        " FROM range(4)")))
    // int arrays: not the double fast path
    assert(!hasDot(s2.sql(
      "SELECT aggregate(zip_with(array(id), array(2L)," +
        " (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS x" +
        " FROM range(4)")))
  }
}
