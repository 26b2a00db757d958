package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** The generic one-pass table profiler: null accounting, exact vs approx
  * distinct modes, and the single-exchange plan shape. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("profiles nulls, distincts, and min/max on a mixed frame") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(1.5)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(3.5)))
      .toDF("id", "s", "v")
    val p = Profile.profileTable(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    val s = p("s")
    assert(s.getString(1) == "string")
    assert(s.getLong(2) == 3 && s.getLong(3) == 1) // non-null / null
    assert(s.getLong(4) == 2)                      // distinct excl. null
    assert(s.getString(5) == "a" && s.getString(6) == "b")
    val v = p("v")
    assert(v.getLong(3) == 1 && v.getLong(4) == 3)
    assert(v.getString(5) == "1.5" && v.getString(6) == "3.5")
    val id = p("id")
    assert(id.getString(1) == "bigint" && id.getLong(3) == 0)
  }

  test("approx mode agrees with exact everywhere but the sketched distinct") {
    val nation = Tables.nation(spark, GraftSpark.sf)
    val exact = Profile.profileTable(nation, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profile.profileTable(nation)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      for (i <- Seq(1, 2, 3, 5, 6))
        assert(e.get(i) == a.get(i), s"$c field $i diverged")
      val (de, da) = (e.getLong(4).toDouble, a.getLong(4).toDouble)
      assert(math.abs(da - de) <= math.max(2.0, 0.1 * de),
        s"$c: approx distinct $da too far from exact $de")
    }
  }

  test("approx profile is one aggregation exchange over one scan") {
    val df = Profile.profileTable(Tables.nation(spark, GraftSpark.sf))
    df.collect()
    // an AdaptiveSparkPlan prints final AND initial plans — judge only
    // the final one
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"profile must be a single agg exchange:\n$p")
    assert(!p.contains("Expand"), "approx mode must not Expand:\n" + p)
  }

  test("histogram: boundary values bucket down, out-of-range rows drop") {
    import spark.implicits._
    val df = Seq(-0.1, 0.0, 4.999, 5.0, 9.999, 10.0, 15.0)
      .toDF("x")
    val got = Profile.histogram(df, "x", bins = 2, lo = 0.0, hi = 10.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    // -0.1, 10.0, 15.0 fall outside [0, 10)
    assert(got == Map(0L -> (0.0, 2L), 1L -> (5.0, 2L)), got.toString)
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "x", bins = 0, lo = 0.0, hi = 1.0)
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "x", bins = 4, lo = 1.0, hi = 1.0)
    }
  }

  test("refuses a zero-column frame") {
    intercept[IllegalArgumentException] {
      Profile.profileTable(spark.range(3).drop("id"))
    }
  }
}
