package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlEntityMath
import graft.operators.{Curation, TextAnalysis}

/** HTML → text extraction: kernel-level entity-decode semantics, the
  * extraction contract on crafted pages, the Curation front-stage
  * equivalence, and a hostile-markup fuzz sweep (torn tags, attribute
  * bombs, entity bombs — extraction must degrade to torn TEXT, never
  * throw). */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  private def extract1(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(TextAnalysis.extractText(col("h")).as("t"))
      .as[String].head()
  }

  // ---- HtmlEntityMath kernel ----

  test("named, decimal, hex and supplementary references decode") {
    val d = HtmlEntityMath.decodeString _
    assert(d("a &amp; b") == "a & b")
    assert(d("&lt;p&gt;") == "<p>")
    assert(d("&quot;q&quot; &apos;s&apos;") == "\"q\" 's'")
    assert(d("caf&eacute;") == "café")
    assert(d("&#65;&#x42;&#X43;") == "ABC")
    assert(d("1&nbsp;000") == "1 000")
    assert(d("&euro;5 &mdash; &hellip;") == "€5 — …")
    // supplementary plane → surrogate pair in the output
    assert(d("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(d("&#128512;") == new String(Character.toChars(0x1F600)))
  }

  test("the full HTML 4.01 table decodes: Greek, arrows, math, spacing") {
    val d = HtmlEntityMath.decodeString _
    // one representative per table section, spot-checked by codepoint
    assert(d("&Agrave;&yuml;") == "Àÿ") // lat1 endpoints
    assert(d("&alpha;&beta;&gamma; &Omega;") == "αβγ Ω")
    assert(d("&sigmaf;&thetasym;&piv;") == "ςϑϖ")
    assert(d("&larr;&rArr;&harr;") == "←⇒↔")
    assert(d("x &le; y &ne; z &isin; S") == "x ≤ y ≠ z ∈ S")
    assert(d("&sum;&prod;&int;&radic;&infin;") ==
      "∑∏∫√∞")
    assert(d("&lceil;&lang;&rang;&rfloor;") ==
      "⌈⟨⟩⌋") // lang/rang at the HTML5 codepoints
    assert(d("&OElig;&scaron;&Yuml;&fnof;") == "ŒšŸƒ")
    assert(d("&ensp;|&thinsp;|&zwnj;|&zwj;") ==
      "\u2002|\u2009|\u200C|\u200D")
    assert(d("&dagger;&Dagger;&permil;&frasl;") ==
      "†‡‰⁄")
    assert(d("&spades;&clubs;&hearts;&diams;&loz;") ==
      "♠♣♥♦◊")
    assert(d("&not;&curren;&brvbar;&uml;&macr;&cedil;") ==
      "¬¤¦¨¯¸")
    assert(d("&weierp;&image;&real;&alefsym;") ==
      "℘ℑℜℵ")
    // case matters: &Sigma; vs &sigma;, unknown casings pass through
    assert(d("&Sigma;&sigma;") == "Σσ")
    assert(d("&SIGMA;") == "&SIGMA;")
    // HTML5-only long names still pass through verbatim
    assert(d("&CounterClockwiseContourIntegral;") ==
      "&CounterClockwiseContourIntegral;")
  }

  test("one pass, no rescan: &amp;lt; is the literal text &lt;") {
    assert(HtmlEntityMath.decodeString("&amp;lt;") == "&lt;")
    assert(HtmlEntityMath.decodeString("&amp;amp;lt;") == "&amp;lt;")
  }

  test("torn / invalid references pass through verbatim") {
    val d = HtmlEntityMath.decodeString _
    for (s <- Seq(
        "&", "&&", "a & b", "&nbsp", "&;", "&#;", "&#x;", "&#xG1;",
        "&unknownname;", "&#1114112;", // 0x110000: out of range
        "&#xD800;", "&#0;", "&#-1;", "&#99999999;",
        "&" + "a" * 40 + ";", // body longer than the 32-char lookahead
        "&#" + "9" * 8 + ";")) // digit run longer than 7
      assert(d(s) == s, s"should pass through: $s")
    // a valid reference right after an invalid one still decodes
    assert(d("&nope;&amp;") == "&nope;&")
  }

  // ---- extractText contract ----

  test("script/style subtrees vanish, markup inside script cannot leak") {
    val out = extract1(
      "<html><head><style>p{color:red}</style>" +
        "<script>var x = \"<p>leak</p>\";</script></head>" +
        "<body><p>real text</p></body></html>")
    assert(out == "real text")
  }

  test("unterminated comment and script swallow to end of input") {
    assert(extract1("<p>kept</p><script>drop = all; // no close") == "kept")
    assert(extract1("<p>kept</p><!-- never closed <p>gone</p>") == "kept")
  }

  test("block tags become line structure; inline tags become spaces") {
    val out = extract1(
      "<h1>Title</h1><p>one <b>bold</b> word</p><ul><li>a</li>" +
        "<li>b</li></ul>")
    assert(out == "Title\none bold word\na\nb")
    // inline boundary must not glue tokens
    assert(extract1("end<b>Start") == "end Start")
  }

  test("entities decode AFTER tag strip — &lt;script&gt; stays text") {
    val out = extract1("<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>")
    assert(out == "<script>alert(1)</script>")
  }

  test("NBSP and CR/tab runs collapse to single spaces; ends trim") {
    assert(extract1("<p>1&nbsp;000\t\tx</p>\r\n  ") == "1 000 x")
  }

  test("null input stays null; empty input → empty") {
    import spark.implicits._
    val r = Seq[(Integer, String)]((1, null), (2, ""), (3, "<p>t</p>"))
      .toDF("i", "h")
      .select(col("i"), TextAnalysis.extractText(col("h")).as("t"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(r(0)._2 == null)
    assert(r(1)._2 == "")
    assert(r(2)._2 == "t")
  }

  // ---- Curation front stage ----

  test("htmlExtract front stage equals running the pipeline on extracted text") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${GraftSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
    val asHtml = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("<html><body><p>"),
        col("text"),
        org.apache.spark.sql.functions.lit("</p></body></html>")).as("text"))
    val viaFront = Curation.pipeline(asHtml, "doc_id", "text",
      Curation.Config(htmlExtract = true)).df
    val plain = Curation.pipeline(docs, "doc_id", "text").df
    val a = viaFront.orderBy("doc_id")
      .as[(Long, String, Double, String, String)].collect()
    val b = plain.orderBy("doc_id")
      .as[(Long, String, Double, String, String)].collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("htmlExtract front stage on the curation STREAM equals the plain-text stream") {
    import org.apache.spark.sql.functions.{concat, lit}
    val docs = spark.read.parquet(s"${GraftSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
    val asHtml = docs.select(col("doc_id"),
      concat(lit("<html><body><p>"), col("text"),
        lit("</p></body></html>")).as("text"))
    def screened(in: org.apache.spark.sql.DataFrame,
        cfg: graft.operators.Curation.Config): Seq[String] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_html_scr")
      in.write.mode("overwrite").parquet(dir.toString)
      val name = s"html_scr_${dir.getFileName.toString.takeRight(6)}"
      val q = graft.streaming.Streams.curationScreenStream(
          spark.readStream.schema(in.schema).parquet(dir.toString),
          "doc_id", "text", None, cfg)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        spark.table(name).collect().map(_.toString).sorted.toSeq
      } finally q.stop()
    }
    val viaFront = screened(asHtml,
      graft.operators.Curation.Config(htmlExtract = true))
    val plain = screened(docs, graft.operators.Curation.Config())
    assert(viaFront.nonEmpty && viaFront == plain,
      "streamed htmlExtract front stage must be bit-identical to the " +
        "stream over pre-extracted text")
  }

  // ---- hostile-markup fuzz ----

  private val tagName = Gen.oneOf("p", "P", "div", "b", "script", "SCRIPT",
    "style", "h1", "li", "br", "x-custom", "svg")
  private val attr = Gen.oneOf(
    " class=\"a b\"", " data-x='1'", " style=\"x:&amp;\"",
    " onclick=\"f('<p>')\"", " " + ("a" * 30) + "=\"" + ("b" * 40) + "\"",
    "", " disabled", " q=\">\"")
  private val openTag = for {
    t <- tagName
    n <- Gen.choose(0, 6)
    as <- Gen.listOfN(n, attr)
  } yield s"<$t${as.mkString}>"
  private val piece: Gen[String] = Gen.frequency(
    4 -> openTag,
    2 -> tagName.map(t => s"</$t>"),
    4 -> Gen.oneOf("word", "two words", "a &amp; b", "&#x41;", "&nbsp;",
      "&broken", "&&&", "100%", "x < y", "y > x", "q;"),
    1 -> Gen.oneOf("<!--", "-->", "<!-- c -->", "<![CDATA[ x ]]>"),
    1 -> Gen.oneOf("<", ">", "</", "<>", "< p>", "&#", "&#x"),
    1 -> Gen.oneOf("<script>", "</script>", "<style>", "</style>"))
  private val soup: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ps <- Gen.listOfN(n, piece)
  } yield ps.mkString(" ")

  test("hostile markup never throws and never yields null for non-null input") {
    import spark.implicits._
    val inputs = Gen.listOfN(500, soup)
      .apply(Gen.Parameters.default, Seed(20260815L)).get
    val out = inputs.toDF("h")
      .select(TextAnalysis.extractText(col("h")).as("t"))
      .as[String].collect()
    assert(out.length == 500)
    assert(out.forall(_ != null))
  }

  test("well-formed markup strips completely: no tag chars survive") {
    import spark.implicits._
    // balanced tags around entity-free words: every '<'/'>' in the input
    // belongs to markup, so none may survive extraction
    val wf = for {
      t <- Gen.oneOf("p", "div", "h2", "li", "em")
      n <- Gen.choose(0, 3)
      as <- Gen.listOfN(n, Gen.oneOf(" class=\"x\"", " id='k'", ""))
      w <- Gen.oneOf("alpha", "beta gamma", "123")
    } yield s"<$t${as.mkString}>$w</$t>"
    val pages = Gen.listOfN(300, Gen.listOfN(5, wf).map(_.mkString))
      .apply(Gen.Parameters.default, Seed(20260816L)).get
    val out = pages.toDF("h")
      .select(TextAnalysis.extractText(col("h")).as("t"))
      .as[String].collect()
    assert(out.forall(t => !t.contains('<') && !t.contains('>')))
  }
}
