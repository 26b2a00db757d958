package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for HTML character-reference decoding — the [[AdcMath]] /
  * [[PqEncodeMath]] pattern: a top-level object compiles to static
  * forwarders the janino-generated code calls directly.
  *
  * Semantics (deliberately simple and one-pass, so the DuckDB oracle can
  * replay a defined entity subset with a `replace()` chain that rewrites
  * `&amp;` LAST):
  *
  *  - ONE left-to-right scan, never re-scanning produced text: `&amp;lt;`
  *    decodes to the literal four characters `&lt;`, NOT to `<` — the
  *    behavior every sane extractor wants, because double-decoding is how
  *    entity-smuggled markup re-enters a "stripped" corpus.
  *  - Named references from the complete W3C HTML 4.01 table (252 names:
  *    Latin-1, Greek, arrows, math operators, punctuation/spacing) plus
  *    the HTML5 `apos` and angle-bracket revisions — everything that
  *    occurs in real crawl text. Unknown names (the ~1,900 HTML5-only
  *    math long names) pass through verbatim.
  *  - Numeric references `&#123;` / `&#x1F600;` decode to the code point,
  *    including supplementary planes (surrogate pair in the output).
  *    Out-of-range / surrogate / empty / overlong digit runs pass through
  *    verbatim — a torn reference is data, not a crash.
  *  - A reference must close with `;` within 32 chars of the `&`; anything
  *    else (bare `&`, `&nbsp` without semicolon) is literal text. The
  *    bounded lookahead keeps the scan linear on `&`-bombs.
  */
object HtmlEntityMath {

  /** name → replacement text; built once per JVM, read-only after.
    * The COMPLETE W3C HTML 4.01 reference set (HTMLlat1 96 + HTMLsymbol
    * 124 + HTMLspecial 32 names) plus the HTML5 revisions that matter in
    * text (`apos`; `lang`/`rang` at the HTML5 mathematical angle
    * brackets U+27E8/27E9, where browsers actually land them). The
    * long-tail HTML5-only math names (&CounterClockwiseContourIntegral;
    * and ~1,900 friends) stay pass-through: they never occur in crawl
    * text, and an unknown name surviving verbatim is inspectable — a
    * wrong codepoint silently poisoning a corpus is not. */
  private val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    def p(k: String, cp: Int): Unit = m.put(k, new String(Character.toChars(cp)))
    // XML five (+HTML5 apos)
    p("amp", '&'); p("lt", '<'); p("gt", '>'); p("quot", '"'); p("apos", '\'')
    // HTMLlat1: U+00A0–U+00FF, complete and in codepoint order
    p("nbsp", 0xA0); p("iexcl", 0xA1); p("cent", 0xA2); p("pound", 0xA3)
    p("curren", 0xA4); p("yen", 0xA5); p("brvbar", 0xA6); p("sect", 0xA7)
    p("uml", 0xA8); p("copy", 0xA9); p("ordf", 0xAA); p("laquo", 0xAB)
    p("not", 0xAC); p("shy", 0xAD); p("reg", 0xAE); p("macr", 0xAF)
    p("deg", 0xB0); p("plusmn", 0xB1); p("sup2", 0xB2); p("sup3", 0xB3)
    p("acute", 0xB4); p("micro", 0xB5); p("para", 0xB6); p("middot", 0xB7)
    p("cedil", 0xB8); p("sup1", 0xB9); p("ordm", 0xBA); p("raquo", 0xBB)
    p("frac14", 0xBC); p("frac12", 0xBD); p("frac34", 0xBE); p("iquest", 0xBF)
    p("Agrave", 0xC0); p("Aacute", 0xC1); p("Acirc", 0xC2); p("Atilde", 0xC3)
    p("Auml", 0xC4); p("Aring", 0xC5); p("AElig", 0xC6); p("Ccedil", 0xC7)
    p("Egrave", 0xC8); p("Eacute", 0xC9); p("Ecirc", 0xCA); p("Euml", 0xCB)
    p("Igrave", 0xCC); p("Iacute", 0xCD); p("Icirc", 0xCE); p("Iuml", 0xCF)
    p("ETH", 0xD0); p("Ntilde", 0xD1); p("Ograve", 0xD2); p("Oacute", 0xD3)
    p("Ocirc", 0xD4); p("Otilde", 0xD5); p("Ouml", 0xD6); p("times", 0xD7)
    p("Oslash", 0xD8); p("Ugrave", 0xD9); p("Uacute", 0xDA); p("Ucirc", 0xDB)
    p("Uuml", 0xDC); p("Yacute", 0xDD); p("THORN", 0xDE); p("szlig", 0xDF)
    p("agrave", 0xE0); p("aacute", 0xE1); p("acirc", 0xE2); p("atilde", 0xE3)
    p("auml", 0xE4); p("aring", 0xE5); p("aelig", 0xE6); p("ccedil", 0xE7)
    p("egrave", 0xE8); p("eacute", 0xE9); p("ecirc", 0xEA); p("euml", 0xEB)
    p("igrave", 0xEC); p("iacute", 0xED); p("icirc", 0xEE); p("iuml", 0xEF)
    p("eth", 0xF0); p("ntilde", 0xF1); p("ograve", 0xF2); p("oacute", 0xF3)
    p("ocirc", 0xF4); p("otilde", 0xF5); p("ouml", 0xF6); p("divide", 0xF7)
    p("oslash", 0xF8); p("ugrave", 0xF9); p("uacute", 0xFA); p("ucirc", 0xFB)
    p("uuml", 0xFC); p("yacute", 0xFD); p("thorn", 0xFE); p("yuml", 0xFF)
    // HTMLspecial: Latin Extended / punctuation / spacing
    p("OElig", 0x152); p("oelig", 0x153); p("Scaron", 0x160)
    p("scaron", 0x161); p("Yuml", 0x178); p("circ", 0x2C6)
    p("tilde", 0x2DC); p("ensp", 0x2002); p("emsp", 0x2003)
    p("thinsp", 0x2009); p("zwnj", 0x200C); p("zwj", 0x200D)
    p("lrm", 0x200E); p("rlm", 0x200F); p("ndash", 0x2013)
    p("mdash", 0x2014); p("lsquo", 0x2018); p("rsquo", 0x2019)
    p("sbquo", 0x201A); p("ldquo", 0x201C); p("rdquo", 0x201D)
    p("bdquo", 0x201E); p("dagger", 0x2020); p("Dagger", 0x2021)
    p("permil", 0x2030); p("lsaquo", 0x2039); p("rsaquo", 0x203A)
    p("euro", 0x20AC)
    // HTMLsymbol: Greek
    p("fnof", 0x192)
    p("Alpha", 0x391); p("Beta", 0x392); p("Gamma", 0x393)
    p("Delta", 0x394); p("Epsilon", 0x395); p("Zeta", 0x396)
    p("Eta", 0x397); p("Theta", 0x398); p("Iota", 0x399)
    p("Kappa", 0x39A); p("Lambda", 0x39B); p("Mu", 0x39C)
    p("Nu", 0x39D); p("Xi", 0x39E); p("Omicron", 0x39F)
    p("Pi", 0x3A0); p("Rho", 0x3A1); p("Sigma", 0x3A3)
    p("Tau", 0x3A4); p("Upsilon", 0x3A5); p("Phi", 0x3A6)
    p("Chi", 0x3A7); p("Psi", 0x3A8); p("Omega", 0x3A9)
    p("alpha", 0x3B1); p("beta", 0x3B2); p("gamma", 0x3B3)
    p("delta", 0x3B4); p("epsilon", 0x3B5); p("zeta", 0x3B6)
    p("eta", 0x3B7); p("theta", 0x3B8); p("iota", 0x3B9)
    p("kappa", 0x3BA); p("lambda", 0x3BB); p("mu", 0x3BC)
    p("nu", 0x3BD); p("xi", 0x3BE); p("omicron", 0x3BF)
    p("pi", 0x3C0); p("rho", 0x3C1); p("sigmaf", 0x3C2)
    p("sigma", 0x3C3); p("tau", 0x3C4); p("upsilon", 0x3C5)
    p("phi", 0x3C6); p("chi", 0x3C7); p("psi", 0x3C8)
    p("omega", 0x3C9); p("thetasym", 0x3D1); p("upsih", 0x3D2)
    p("piv", 0x3D6)
    // HTMLsymbol: general punctuation / letterlike
    p("bull", 0x2022); p("hellip", 0x2026); p("prime", 0x2032)
    p("Prime", 0x2033); p("oline", 0x203E); p("frasl", 0x2044)
    p("weierp", 0x2118); p("image", 0x2111); p("real", 0x211C)
    p("trade", 0x2122); p("alefsym", 0x2135)
    // HTMLsymbol: arrows
    p("larr", 0x2190); p("uarr", 0x2191); p("rarr", 0x2192)
    p("darr", 0x2193); p("harr", 0x2194); p("crarr", 0x21B5)
    p("lArr", 0x21D0); p("uArr", 0x21D1); p("rArr", 0x21D2)
    p("dArr", 0x21D3); p("hArr", 0x21D4)
    // HTMLsymbol: mathematical operators
    p("forall", 0x2200); p("part", 0x2202); p("exist", 0x2203)
    p("empty", 0x2205); p("nabla", 0x2207); p("isin", 0x2208)
    p("notin", 0x2209); p("ni", 0x220B); p("prod", 0x220F)
    p("sum", 0x2211); p("minus", 0x2212); p("lowast", 0x2217)
    p("radic", 0x221A); p("prop", 0x221D); p("infin", 0x221E)
    p("ang", 0x2220); p("and", 0x2227); p("or", 0x2228)
    p("cap", 0x2229); p("cup", 0x222A); p("int", 0x222B)
    p("there4", 0x2234); p("sim", 0x223C); p("cong", 0x2245)
    p("asymp", 0x2248); p("ne", 0x2260); p("equiv", 0x2261)
    p("le", 0x2264); p("ge", 0x2265); p("sub", 0x2282)
    p("sup", 0x2283); p("nsub", 0x2284); p("sube", 0x2286)
    p("supe", 0x2287); p("oplus", 0x2295); p("otimes", 0x2297)
    p("perp", 0x22A5); p("sdot", 0x22C5)
    // HTMLsymbol: technical / shapes / suits (lang/rang per HTML5)
    p("lceil", 0x2308); p("rceil", 0x2309); p("lfloor", 0x230A)
    p("rfloor", 0x230B); p("lang", 0x27E8); p("rang", 0x27E9)
    p("loz", 0x25CA); p("spades", 0x2660); p("clubs", 0x2663)
    p("hearts", 0x2665); p("diams", 0x2666)
    m
  }

  /** Longest reference body we accept between `&` and `;` — longer runs
    * are treated as literal text (keeps hostile input linear). */
  private val MaxBody = 32

  /** Decode one candidate reference starting at `amp` (s(amp) == '&').
    * Appends the decoded text to `sb` and returns the index AFTER the
    * closing `;`, or -1 when this `&` does not open a valid reference. */
  private def decodeOne(s: String, amp: Int, sb: java.lang.StringBuilder): Int = {
    val lim = math.min(s.length, amp + 2 + MaxBody)
    var semi = amp + 1
    while (semi < lim && s.charAt(semi) != ';') semi += 1
    if (semi >= lim || semi == amp + 1) return -1
    val body = s.substring(amp + 1, semi)
    if (body.charAt(0) == '#') {
      if (body.length < 2) return -1
      val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
      val digits = if (hex) body.substring(2) else body.substring(1)
      if (digits.isEmpty || digits.length > 7) return -1
      var cp = 0
      var i = 0
      val radix = if (hex) 16 else 10
      while (i < digits.length) {
        val d = Character.digit(digits.charAt(i), radix)
        if (d < 0) return -1
        cp = cp * radix + d
        i += 1
      }
      if (cp <= 0 || cp > 0x10FFFF ||
        (cp >= 0xD800 && cp <= 0xDFFF)) return -1
      sb.appendCodePoint(cp)
      semi + 1
    } else {
      val rep = Named.get(body)
      if (rep == null) -1
      else { sb.append(rep); semi + 1 }
    }
  }

  /** One-pass entity decode over a String. */
  def decodeString(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    while (i >= 0) {
      sb.append(s, start, i)
      val next = decodeOne(s, i, sb)
      if (next < 0) { sb.append('&'); start = i + 1 }
      else start = next
      i = s.indexOf('&', start)
    }
    sb.append(s, start, s.length)
    sb.toString
  }

  /** UTF8String entry point for codegen / interpreted eval. Inputs with
    * no `&` return the input object unchanged (no copy). */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = decodeString(str)
    if (out.eq(str)) s else UTF8String.fromString(out)
  }
}

/** `html_entity_decode(s)` — [[HtmlEntityMath.decodeString]] as a native
  * unary expression: stays inside whole-stage codegen, so the decode runs
  * in the same generated loop as the tag-strip `regexp_replace` chain of
  * [[graft.operators.TextAnalysis.extractText]] (one pass over the scan,
  * no Row materialization, no UDF serialization).
  */
case class HtmlEntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    HtmlEntityMath.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlEntityMath.decode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
