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
  *  - Named references from a fixed table of the ~50 entities that cover
  *    real crawl text (XML five, nbsp, dashes/quotes/ellipsis, currency,
  *    math signs, Latin-1 letters). Unknown names pass through verbatim.
  *  - Numeric references `&#123;` / `&#x1F600;` decode to the code point,
  *    including supplementary planes (surrogate pair in the output).
  *    Out-of-range / surrogate / empty / overlong digit runs pass through
  *    verbatim — a torn reference is data, not a crash.
  *  - A reference must close with `;` within 32 chars of the `&`; anything
  *    else (bare `&`, `&nbsp` without semicolon) is literal text. The
  *    bounded lookahead keeps the scan linear on `&`-bombs.
  */
object HtmlEntityMath {

  /** name → replacement text; built once per JVM, read-only after. */
  private val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](128)
    def p(k: String, cp: Int): Unit = m.put(k, new String(Character.toChars(cp)))
    p("amp", '&'); p("lt", '<'); p("gt", '>'); p("quot", '"'); p("apos", '\'')
    p("nbsp", 0xA0); p("shy", 0xAD)
    p("copy", 0xA9); p("reg", 0xAE); p("trade", 0x2122)
    p("mdash", 0x2014); p("ndash", 0x2013); p("hellip", 0x2026)
    p("lsquo", 0x2018); p("rsquo", 0x2019); p("ldquo", 0x201C); p("rdquo", 0x201D)
    p("laquo", 0xAB); p("raquo", 0xBB)
    p("deg", 0xB0); p("middot", 0xB7); p("bull", 0x2022)
    p("sect", 0xA7); p("para", 0xB6)
    p("plusmn", 0xB1); p("times", 0xD7); p("divide", 0xF7)
    p("frac12", 0xBD); p("frac14", 0xBC); p("frac34", 0xBE)
    p("sup2", 0xB2); p("sup3", 0xB3); p("micro", 0xB5)
    p("cent", 0xA2); p("pound", 0xA3); p("euro", 0x20AC); p("yen", 0xA5)
    p("eacute", 0xE9); p("egrave", 0xE8); p("ecirc", 0xEA); p("euml", 0xEB)
    p("aacute", 0xE1); p("agrave", 0xE0); p("acirc", 0xE2); p("auml", 0xE4)
    p("oacute", 0xF3); p("ocirc", 0xF4); p("ouml", 0xF6); p("oslash", 0xF8)
    p("uacute", 0xFA); p("ucirc", 0xFB); p("uuml", 0xFC)
    p("iacute", 0xED); p("icirc", 0xEE); p("iuml", 0xEF)
    p("ccedil", 0xE7); p("ntilde", 0xF1); p("szlig", 0xDF); p("aring", 0xE5)
    p("aelig", 0xE6)
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
