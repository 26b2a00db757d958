package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** RFC 9309 robots.txt evaluation: the pure kernel (group parsing,
  * merge semantics, wildcard/anchor matching, precedence) plus the
  * Column surface on a DataFrame. */
class RobotsSpec extends AnyFunSuite {

  private def allowed(robots: String, agent: String, path: String) =
    Robots.decide(robots, agent, path)._1
  private def delay(robots: String, agent: String) =
    Robots.decide(robots, agent, "/")._2

  test("wildcard and anchor matching") {
    assert(Robots.pathMatches("/p/", "/p/x"))       // prefix
    assert(!Robots.pathMatches("/p/", "/q/x"))
    assert(Robots.pathMatches("/a*b", "/aXXXb/c"))  // star spans a run
    assert(Robots.pathMatches("/a*b*c", "/a1b2b3c")) // backtracking
    assert(!Robots.pathMatches("/a*b$", "/aXb/c"))  // anchored miss
    assert(Robots.pathMatches("/a*b$", "/aXXb"))    // anchored hit
    assert(Robots.pathMatches("", "/anything"))     // empty = match all
    assert(Robots.pathMatches("/*", "/"))
    assert(!Robots.pathMatches("$", "/x"))
    assert(Robots.pathMatches("/x$", "/x"))
  }

  private val policy =
    """# global
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok$
      |
      |User-agent: BotA
      |User-agent: BotB
      |Disallow: /shared
      |
      |User-agent: bota
      |Allow: /shared/yes
      |Crawl-delay: 2.5
      |Weird-key: ignored
      |Crawl-delay: 9
      |""".stripMargin

  test("group selection: case-insensitive agent, * fallback, merge") {
    // BotA matches TWO groups — their rules merge (RFC 9309 §2.2.1)
    assert(!allowed(policy, "BOTA", "/shared/x"))
    assert(allowed(policy, "BotA", "/shared/yes/now")) // merged Allow wins
    // BotB matches only the shared group — no Allow reaches it
    assert(!allowed(policy, "botb", "/shared/yes/now"))
    assert(!allowed(policy, "BotB", "/shared/anything"))
    assert(allowed(policy, "BotB", "/other"))
    // unknown bot falls back to *
    assert(!allowed(policy, "stranger", "/private/x"))
    assert(allowed(policy, "stranger", "/public"))
    // matched group suppresses * entirely: BotA may enter /private
    assert(allowed(policy, "BotA", "/private/x"))
  }

  test("precedence: longest pattern wins; Allow wins ties; $ anchors") {
    assert(allowed(policy, "nobody", "/private/ok"))   // anchored Allow
    assert(!allowed(policy, "nobody", "/private/okx")) // anchor misses
    val tie = "User-agent: *\nDisallow: /a/b\nAllow: /a/?" // same length
    assert(allowed(tie.replace("?", "b"), "x", "/a/b"))
    // no matching rule at all → allowed
    assert(allowed("User-agent: *\nDisallow: /x", "x", "/y"))
    // empty Disallow permits everything
    assert(allowed("User-agent: *\nDisallow:", "x", "/anything"))
    // null/empty robots → allowed, no delay
    assert(allowed(null, "x", "/y") && delay(null, "x").isEmpty)
  }

  test("crawl-delay: first parseable value of the merged group") {
    assert(delay(policy, "BotA").contains(2.5))
    assert(delay(policy, "stranger").isEmpty) // * group has none
  }

  test("Column surface evaluates over a frame") {
    val spark = GraftSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(("/shared/x", "BotA"), ("/public", "BotA"),
      ("/private/q", "zz")).toDF("path", "agent")
    val got = df.select(col("path"),
      Robots.robotsVerdict(lit(policy), col("agent"), col("path"))
        .getField("allowed").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("/shared/x" -> false, "/public" -> true,
      "/private/q" -> false))
  }
}
