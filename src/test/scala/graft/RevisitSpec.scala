package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Revisit

/** [[Revisit.revisitSchedule]] semantics on closed-form histories: the
  * backoff doubling across crawl cycles, the reset on change, the hint
  * mapping with its shortest-wins conflict rule, the lastmod override,
  * and the caps. The q_t68 oracle certifies the arithmetic end to end;
  * these pin the CONTRACT a scheduler composes against. */
class RevisitSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def sched(rows: Seq[(String, Double, Boolean)],
      hints: Option[org.apache.spark.sql.DataFrame] = None,
      lastmodCol: Option[String] = None)
      : Map[String, (Double, Long, Double, Double)] =
    Revisit.revisitSchedule(rows.toDF("url", "ft", "chg"),
        "url", "ft", "chg", hints = hints, hintLastmodCol = lastmodCol)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("schedule advances across crawl cycles: doubling, reset, re-doubling") {
    val t0 = 1.7e9
    // cycle 1: first fetch, content new (changed)
    val c1 = Seq(("u", t0, true))
    assert(sched(c1)("u") == ((t0, 0L, 86400.0, t0 + 86400.0)),
      "fresh page starts at the base interval")
    // cycle 2: revisit found it unchanged — interval doubles
    val c2 = c1 :+ (("u", t0 + 86400.0, false))
    assert(sched(c2)("u") ==
      ((t0 + 86400.0, 1L, 172800.0, t0 + 86400.0 + 172800.0)))
    // cycle 3: unchanged again — doubles again
    val c3 = c2 :+ (("u", t0 + 259200.0, false))
    assert(sched(c3)("u")._3 == 345600.0)
    // cycle 4: CHANGED — streak and interval reset to base
    val c4 = c3 :+ (("u", t0 + 604800.0, true))
    assert(sched(c4)("u") ==
      ((t0 + 604800.0, 0L, 86400.0, t0 + 604800.0 + 86400.0)))
    // cycle 5: unchanged after the reset — doubling restarts from base
    val c5 = c4 :+ (("u", t0 + 691200.0, false))
    assert(sched(c5)("u")._3 == 172800.0)
  }

  test("interval caps at maxIntervalSeconds; never-changed streak counts all") {
    val t0 = 1.7e9
    // 12 unchanged fetches, never a change: streak 12, 86400*2^12 would
    // be ~34k days — capped at the 30-day default
    val rows = (0 until 12).map(i => ("u", t0 + i * 1000.0, false))
    val got = sched(rows)("u")
    assert(got._2 == 12L && got._3 == 2592000.0,
      s"cap must bound the backoff: $got")
    // null changed counts as unchanged
    val withNull = Revisit.revisitSchedule(
      Seq(("u", t0, Some(true)), ("u", t0 + 1, None))
        .toDF("url", "ft", "chg"), "url", "ft", "chg")
      .head()
    assert(withNull.getLong(2) == 1L)
  }

  test("changeRates: CGM estimator, first-sight excluded, null guards") {
    val t0 = 1.7e9
    // u: 4 fetches 100 s apart; revisits at +100 (changed), +200
    // (unchanged), +300 (changed) → n=3, X=2, mean gap 100
    val hist = Seq(
      ("u", t0, true), ("u", t0 + 100, true),
      ("u", t0 + 200, false), ("u", t0 + 300, true),
      ("once", t0 + 5, true), // single fetch: null
      ("same", t0, true), ("same", t0, false)) // zero span: null
      .toDF("url", "ft", "chg")
    val got = Revisit.changeRates(hist, "url", "ft", "chg")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    val expected = -math.log((3 - 2 + 0.5) / (3 + 0.5)) / 100.0 * 86400
    assert(got("u")._1 == 4L && got("u")._2 == 2L)
    assert(math.abs(got("u")._3.get - expected) < 1e-9,
      s"λ̂ must match the closed form: ${got("u")._3} vs $expected")
    assert(got("once") == ((1L, 0L, None)))
    assert(got("same")._3.isEmpty, "zero time span cannot estimate")
    // more changes → higher rate (monotonicity sanity)
    val calm = Seq(("c", t0, true), ("c", t0 + 100, false),
      ("c", t0 + 200, false), ("c", t0 + 300, true))
      .toDF("url", "ft", "chg")
    val calmRate = Revisit.changeRates(calm, "url", "ft", "chg")
      .head().getDouble(3)
    assert(calmRate < got("u")._3.get,
      s"fewer observed changes must estimate a lower rate: $calmRate")
  }

  test("rateSchedule: risk knob, clamps, zero-rate and unestimable defaults") {
    val t0 = 1.7e9
    val hist = Seq(
      // hot: 3 revisits, all changed, 100 s apart → λ̂ high → min clamp
      ("hot", t0, true), ("hot", t0 + 100, true),
      ("hot", t0 + 200, true), ("hot", t0 + 300, true),
      // mild: one change in 3 revisits, day-scale gaps
      ("mild", t0, true), ("mild", t0 + 86400.0, false),
      ("mild", t0 + 2 * 86400.0, true), ("mild", t0 + 3 * 86400.0, false),
      // frozen: never changed after first sight → λ̂ = 0 → default
      ("frozen", t0, true), ("frozen", t0 + 86400.0, false),
      ("frozen", t0 + 2 * 86400.0, false),
      // lone: single fetch → unestimable → default
      ("lone", t0, true))
      .toDF("url", "ft", "chg")
    val got = Revisit.rateSchedule(hist, "url", "ft", "chg")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("hot")._2 == 3600.0, s"hot page clamps to min: ${got("hot")}")
    val lam = got("mild")._1.get / 86400.0 // per second
    val want = math.min(math.max(math.log(2) / lam, 3600.0), 2592000.0)
    assert(math.abs(got("mild")._2 - want) < 1e-6,
      s"mild interval must follow -ln(.5)/λ: ${got("mild")._2} vs $want")
    assert(got("mild")._3 == t0 + 3 * 86400.0 + got("mild")._2)
    assert(got("frozen")._1.contains(0.0) // -ln(1) is exactly ±0
      || got("frozen")._1.exists(_ == -0.0))
    assert(got("frozen")._2 == 86400.0, "zero rate falls to the default")
    assert(got("lone")._1.isEmpty && got("lone")._2 == 86400.0)
    // a tighter staleness target fetches more often
    val strict = Revisit.rateSchedule(hist, "url", "ft", "chg",
        staleRisk = 0.1)
      .filter(col("url") === "mild").head().getDouble(4)
    assert(strict < got("mild")._2,
      s"lower staleRisk must shorten the interval: $strict")
  }

  test("hints: token mapping, shortest conflict wins, lastmod forces due-now") {
    val t0 = 1.7e9
    val hist = Seq(("a", t0, false), ("b", t0, false), ("c", t0, false),
      ("d", t0, false))
    // a: conflicting weekly+hourly hints → hourly (shortest) wins
    // b: never → maxInterval base (cap holds it there)
    // c: lastmod AFTER the fetch → due immediately
    // d: no hint row → default base
    val hints = Seq(
      ("a", "weekly", null.asInstanceOf[java.lang.Double]),
      ("a", "hourly", null.asInstanceOf[java.lang.Double]),
      ("b", "never", null.asInstanceOf[java.lang.Double]),
      ("c", "daily", java.lang.Double.valueOf(t0 + 50)))
      .toDF("loc", "changefreq", "lastmod")
    val got = sched(hist, Some(hints), Some("lastmod"))
    assert(got("a")._3 == 7200.0, s"shortest hint must win: ${got("a")}")
    assert(got("b")._3 == 2592000.0)
    assert(got("c") == ((t0, 1L, 0.0, t0)),
      s"newer lastmod means due now: ${got("c")}")
    assert(got("d")._3 == 172800.0)
  }
}
