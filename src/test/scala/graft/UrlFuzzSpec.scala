package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Fuzz properties for the URL family. canonicalUrl must be a FIXED
  * POINT (canonical of canonical is canonical — the property that makes
  * it a dedup key), its non-null outputs must satisfy the normal-form
  * contract (lowercase scheme, no fragment, no tracking params, sorted
  * query), inputs without `scheme://` must map to null, and
  * registeredDomain must be idempotent. Raw ScalaCheck Gen with a fixed
  * seed, same pattern as RewritePropertySpec. */
class UrlFuzzSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private val scheme = Gen.oneOf(
    "http", "HTTP", "hTtP", "https", "HTTPS", "ftp", "s3a", "")
  private val label = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaChar, 2 -> Gen.alphaUpperChar, 1 -> Gen.numChar,
      1 -> Gen.const('-')))
  } yield cs.mkString
  private val host = Gen.frequency(
    6 -> (for {
      k <- Gen.choose(1, 4)
      ls <- Gen.listOfN(k, label)
      suffix <- Gen.oneOf("", ".com", ".CO.uk", ".org", ".com.au", ".io")
    } yield ls.mkString(".") + suffix),
    1 -> (for {
      a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    } yield s"10.0.$a.$b"),
    1 -> Gen.const(""))
  private val userinfo = Gen.frequency(
    7 -> Gen.const(""), 2 -> Gen.const("User@"), 1 -> Gen.const("u:Pw@"))
  private val port = Gen.oneOf("", "", "", ":80", ":443", ":8080", ":")
  private val path = Gen.frequency(
    3 -> Gen.const(""), 2 -> Gen.const("/"),
    3 -> (for {
      k <- Gen.choose(1, 3)
      segs <- Gen.listOfN(k, label)
    } yield segs.mkString("/", "/", "")),
    1 -> Gen.const("//Dup//Seg"), 1 -> Gen.const("/p%20q/~u"))
  private val param = Gen.frequency(
    4 -> (for { k <- label; v <- label } yield s"$k=$v"),
    2 -> Gen.oneOf("utm_source=x", "utm_campaign", "gclid=1", "fbclid=2",
      "ref", "ref=r"),
    1 -> label, // key with no '='
    1 -> Gen.const(""))
  private val query = Gen.frequency(
    4 -> Gen.const(""),
    6 -> (for {
      k <- Gen.choose(1, 4)
      ps <- Gen.listOfN(k, param)
    } yield ps.mkString("?", "&", "")))
  private val fragment = Gen.oneOf("", "", "#Frag", "#a?b=c", "#")
  private val pad = Gen.oneOf("", " ", "  ")

  private val urlGen: Gen[String] = for {
    s <- scheme; u <- userinfo; h <- host; po <- port; pa <- path
    q <- query; f <- fragment; l <- pad; r <- pad
  } yield {
    val sep = if (s.isEmpty) "" else "://"
    s"$l$s$sep$u$h$po$pa$q$f$r"
  }

  test("canonicalUrl is a fixed point with a clean normal form; registeredDomain is idempotent") {
    import spark.implicits._
    val urls = Gen.listOfN(600, urlGen)
      .apply(Gen.Parameters.default, Seed(20260814L)).get
    val rows = urls.toDF("u")
      .select(col("u"),
        TextAnalysis.canonicalUrl(col("u")).as("c1"),
        TextAnalysis.canonicalUrl(
          TextAnalysis.canonicalUrl(col("u"))).as("c2"),
        TextAnalysis.urlHost(TextAnalysis.canonicalUrl(col("u"))).as("h"),
        TextAnalysis.registeredDomain(
          TextAnalysis.urlHost(TextAnalysis.canonicalUrl(col("u"))))
          .as("d1"),
        TextAnalysis.registeredDomain(TextAnalysis.registeredDomain(
          TextAnalysis.urlHost(TextAnalysis.canonicalUrl(col("u")))))
          .as("d2"))
      .as[(String, String, String, String, String, String)].collect()
    assert(rows.length == 600)
    assert(rows.exists(_._2 != null), "generator produced no valid URLs")
    assert(rows.exists(_._2 == null), "generator produced no invalid URLs")
    rows.foreach { case (u, c1, c2, h, d1, d2) =>
      assert(c1 == c2, s"not idempotent: $u -> $c1 -> $c2")
      if (!u.trim.matches("^[A-Za-z][A-Za-z0-9+.\\-]*://.*"))
        assert(c1 == null, s"non-URL must canonicalize to null: '$u' -> $c1")
      if (c1 != null) {
        assert(c1.matches("^[a-z][a-z0-9+.\\-]*://.*"),
          s"scheme not normalized: $u -> $c1")
        assert(!c1.contains("#"), s"fragment survived: $u -> $c1")
        val qi = c1.indexOf('?')
        if (qi >= 0) {
          val ps = c1.substring(qi + 1).split("&").toSeq
          assert(ps.forall(p =>
            !p.matches("^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$")),
            s"tracking param survived: $u -> $c1")
          assert(ps == ps.sorted, s"params not sorted: $u -> $c1")
          assert(ps.forall(_.nonEmpty), s"empty param survived: $u -> $c1")
        }
      }
      assert(d1 == d2, s"registeredDomain not idempotent: $h -> $d1 -> $d2")
    }
  }
}
