package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-struct fill semantics of [[graft.operators.AsOfJoin]]:
  * picked values and the matched right row's time always come from the
  * SAME (nearest) right row, and the tolerance delta is computed in the
  * time columns' native numeric type (no long truncation).
  */
class AsOfJoinSpec extends AnyFunSuite {
  import graft.operators.AsOfJoin.asOf

  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("null pick value on the nearest right row stays null " +
      "(no back-fill from an older right row)") {
    val left = Seq((1L, 100L, "p1")).toDF("k", "t", "id")
    // nearest right row (t=90) has a NULL value; an older one (t=50)
    // has a value — per-column fills would resurrect 7.0 here
    val right = Seq((1L, 50L, Some(7.0)), (1L, 90L, None))
      .toDF("k", "t", "v")
    val out = asOf(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").as[(String, Option[Double])].collect()
    assert(out.toSeq === Seq(("p1", None)))
  }

  test("tolerance validates against the NEAREST row's age even when " +
      "its pick value is null") {
    // nearest right row t=90 (delta 10, inside tol=20) carries null;
    // older row t=50 (delta 50, OUTSIDE tol) carries 7.0. The stale-mix
    // bug returned 7.0 \"validated\" by the nearest row's age.
    val left = Seq((1L, 100L, "p1")).toDF("k", "t", "id")
    val right = Seq((1L, 50L, Some(7.0)), (1L, 90L, None))
      .toDF("k", "t", "v")
    val out = asOf(left, right, "k", "t", "t", Seq("v"),
        tolerance = Some(20L))
      .select("id", "asof_v").as[(String, Option[Double])].collect()
    assert(out.toSeq === Seq(("p1", None)))
  }

  test("multi-pick columns all come from one right row") {
    val left = Seq((1L, 100L, "p1")).toDF("k", "t", "id")
    val right = Seq(
      (1L, 50L, Option("a"), Option(1.0)),
      (1L, 90L, None: Option[String], Option(2.0)))
      .toDF("k", "t", "s", "v")
    val out = asOf(left, right, "k", "t", "t", Seq("s", "v"))
      .select("asof_s", "asof_v")
      .as[(Option[String], Option[Double])].collect()
    // both from the t=90 row: s=null (not \"a\"), v=2.0
    assert(out.toSeq === Seq((None, Some(2.0))))
  }

  test("fractional (double) times: tolerance delta is not truncated") {
    // delta = 10.5 - 9.4 = 1.1 > tol 1 -> no match; cast-to-long gave
    // 10 - 9 = 1 <= 1 and wrongly matched
    val left = Seq((1L, 10.5, "p1")).toDF("k", "t", "id")
    val right = Seq((1L, 9.4, 7.0)).toDF("k", "t", "v")
    val out = asOf(left, right, "k", "t", "t", Seq("v"),
        tolerance = Some(1L))
      .select("asof_v").as[Option[Double]].collect()
    assert(out.toSeq === Seq(None))
    // and 0.9 away IS inside tol 1
    val right2 = Seq((1L, 9.6, 7.0)).toDF("k", "t", "v")
    val out2 = asOf(left, right2, "k", "t", "t", Seq("v"),
        tolerance = Some(1L))
      .select("asof_v").as[Option[Double]].collect()
    assert(out2.toSeq === Seq(Some(7.0)))
  }

  test("forward direction with fractional tolerance") {
    val left = Seq((1L, 10.0, "p1")).toDF("k", "t", "id")
    val right = Seq((1L, 11.9, 3.0), (1L, 30.0, 9.0)).toDF("k", "t", "v")
    val in = asOf(left, right, "k", "t", "t", Seq("v"),
        forward = true, tolerance = Some(2L))
      .select("asof_v").as[Option[Double]].collect()
    assert(in.toSeq === Seq(Some(3.0)))
    val out = asOf(left, right.filter(col("t") > 12.0), "k", "t", "t",
        Seq("v"), forward = true, tolerance = Some(2L))
      .select("asof_v").as[Option[Double]].collect()
    assert(out.toSeq === Seq(None))
  }

  test("no prior right row yields nulls; equal timestamp matches") {
    val left = Seq((1L, 10L, "early"), (1L, 20L, "eq")).toDF("k", "t", "id")
    val right = Seq((1L, 20L, 5.0)).toDF("k", "t", "v")
    val out = asOf(left, right, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").as[(String, Option[Double])]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(("early", None), ("eq", Some(5.0))))
  }
}
