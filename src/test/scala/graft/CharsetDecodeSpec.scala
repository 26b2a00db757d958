package graft

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CharsetDecode

/** Charset sniffing + decoding: WHATWG precedence (BOM > header >
  * meta prescan > UTF-8 validity > windows-1252), label aliasing,
  * real multi-charset payloads, and never-throws hostility. */
class CharsetDecodeSpec extends AnyFunSuite {

  private def sniffed(bytes: Array[Byte], ct: String) =
    CharsetDecode.sniff(bytes, ct)._1
  private def decoded(bytes: Array[Byte], ct: String) =
    CharsetDecode.detectAndDecode(bytes, ct)._2

  test("label normalization: WHATWG alias table subset") {
    assert(CharsetDecode.normalizeLabel("UTF8") == "UTF-8")
    assert(CharsetDecode.normalizeLabel(" Utf-8 ") == "UTF-8")
    // the latin1/ascii family maps to its cp1252 superset
    for (l <- Seq("iso-8859-1", "latin1", "US-ASCII", "cp1252",
        "ANSI_X3.4-1968"))
      assert(CharsetDecode.normalizeLabel(l) == "windows-1252", l)
    assert(CharsetDecode.normalizeLabel("Shift-JIS") == "Shift_JIS")
    assert(CharsetDecode.normalizeLabel("gb2312") == "GBK")
    assert(CharsetDecode.normalizeLabel("utf-16") == "UTF-16LE")
    // pass-through for Java-supported names outside the alias table
    assert(CharsetDecode.normalizeLabel("windows-1251") != null)
    assert(CharsetDecode.normalizeLabel("no-such-charset") == null)
    assert(CharsetDecode.normalizeLabel("???!") == null) // illegal name
    assert(CharsetDecode.normalizeLabel(null) == null)
    assert(CharsetDecode.normalizeLabel("") == null)
  }

  test("header charset param: quotes, spacing, first wins") {
    assert(CharsetDecode.headerCharset(
      "text/html; charset=utf-8") == "utf-8")
    assert(CharsetDecode.headerCharset(
      "text/html;charset = \"Windows-1252\" ") == "Windows-1252")
    assert(CharsetDecode.headerCharset(
      "text/html; CHARSET='sjis'; charset=x") == "sjis")
    assert(CharsetDecode.headerCharset("text/html") == null)
    assert(CharsetDecode.headerCharset("text/html; charset=") == null)
    assert(CharsetDecode.headerCharset(null) == null)
  }

  test("precedence: BOM > header > meta > validity > cp1252") {
    val bom = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      "<html>hi</html>".getBytes("UTF-16LE")
    // BOM beats a lying header, and is stripped from the output
    assert(sniffed(bom, "text/html; charset=utf-8") == "UTF-16LE")
    assert(decoded(bom, "text/html; charset=utf-8")
      == "<html>hi</html>")
    val utf8bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "café".getBytes(UTF_8)
    assert(sniffed(utf8bom, null) == "UTF-8"
      && decoded(utf8bom, null) == "café")
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++
      "x".getBytes("UTF-16BE")
    assert(sniffed(be, null) == "UTF-16BE" && decoded(be, null) == "x")
    // header beats meta
    val conflicting =
      "<meta charset=\"utf-8\">café".getBytes(ISO_8859_1)
    assert(sniffed(conflicting,
      "text/html; charset=windows-1252") == "windows-1252")
    assert(decoded(conflicting,
      "text/html; charset=windows-1252") == "<meta charset=\"utf-8\">café")
    // meta prescan finds both forms within the first 1024 bytes
    val meta1 = "<html><meta charset=windows-1252><body>"
      .getBytes(ISO_8859_1) ++ Array(0x80.toByte)
    assert(sniffed(meta1, "text/html") == "windows-1252")
    assert(decoded(meta1, "text/html").endsWith("€"), "0x80 is € in cp1252")
    val meta2 = ("<meta http-equiv=\"Content-Type\" content=\"text/html;" +
      " charset=Shift_JIS\">").getBytes(ISO_8859_1)
    assert(sniffed(meta2, null) == "Shift_JIS")
    // an in-document utf-16 label means utf-8 (WHATWG rule)
    val meta16 = "<meta charset=\"utf-16\">plain".getBytes(ISO_8859_1)
    assert(sniffed(meta16, null) == "UTF-8")
    // a meta BEYOND the 1024-byte prescan window is invisible
    val far = (" " * 1100 + "<meta charset=koi8-r>").getBytes(ISO_8859_1)
    assert(sniffed(far, null) == "UTF-8", "pure ASCII validates as UTF-8")
    // undeclared valid UTF-8 sniffs as UTF-8 (documented deviation)
    val plainUtf8 = "héllo ✓ 日本".getBytes(UTF_8)
    assert(sniffed(plainUtf8, "text/html") == "UTF-8")
    assert(decoded(plainUtf8, "text/html") == "héllo ✓ 日本")
    // undeclared invalid UTF-8 falls to the HTML5 default
    val cp1252 = "caf".getBytes(ISO_8859_1) ++ Array(0xe9.toByte,
      0x20.toByte, 0x93.toByte, 0x71.toByte, 0x94.toByte)
    assert(sniffed(cp1252, null) == "windows-1252")
    assert(decoded(cp1252, null) == "café “q”")
  }

  test("UTF-8 validation: overlongs, surrogates, truncation reject") {
    def v(bs: Int*) = CharsetDecode.isValidUtf8(bs.map(_.toByte).toArray)
    assert(v()) // empty
    assert(v(0x41, 0x7f))
    assert(v(0xc3, 0xa9)) // é
    assert(v(0xe2, 0x82, 0xac)) // €
    assert(v(0xf0, 0x9f, 0x98, 0x80)) // emoji
    assert(!v(0x80)) // bare continuation
    assert(!v(0xc0, 0xaf)) // overlong '/'
    assert(!v(0xc1, 0x81)) // overlong
    assert(!v(0xe0, 0x80, 0x80)) // overlong 3-byte
    assert(!v(0xed, 0xa0, 0x80)) // surrogate
    assert(!v(0xf4, 0x90, 0x80, 0x80)) // > U+10FFFF
    assert(!v(0xf5, 0x80, 0x80, 0x80)) // invalid lead
    assert(!v(0xc3)) // truncated tail
    assert(!v(0xe2, 0x82)) // truncated tail
  }

  test("real charsets round-trip: Shift_JIS, GBK, windows-1251") {
    val sjis = "日本語テスト".getBytes(Charset.forName("Shift_JIS"))
    assert(decoded(sjis, "text/html; charset=shift_jis") == "日本語テスト")
    val gbk = "中文测试".getBytes(Charset.forName("GBK"))
    assert(decoded(gbk, "text/html; charset=gb2312") == "中文测试")
    val ru = "привет".getBytes(Charset.forName("windows-1251"))
    assert(decoded(ru, "text/html; charset=windows-1251") == "привет")
    // the same bytes WITHOUT the header mojibake-degrade but never throw
    assert(decoded(ru, null).nonEmpty)
  }

  test("hostility: null/empty/garbage bytes and labels never throw") {
    assert(CharsetDecode.detectAndDecode(null, "x") == ((null, null)))
    assert(decoded(Array.empty[Byte], null) == "")
    // unknown header label falls through to the next stage
    assert(sniffed("plain ascii".getBytes(UTF_8),
      "text/html; charset=klingon") == "UTF-8")
    // malformed bytes under a DECLARED charset decode with REPLACE
    val bad = Array[Byte](0xe2.toByte, 0x28.toByte, 0xa1.toByte)
    assert(decoded(bad, "text/html; charset=utf-8").nonEmpty)
    // random fuzz: every (bytes, content type) pair must decode
    val rnd = new scala.util.Random(20260816)
    for (i <- 0 until 300) {
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt.toByte)
      val ct = Seq(null, "text/html", "text/html; charset=utf-8",
        "text/html; charset=%%%", "charset=charset=charset")(
        rnd.nextInt(5))
      val (cs, text) = CharsetDecode.detectAndDecode(bytes, ct)
      assert(cs != null && text != null, s"fuzz case $i")
    }
  }

  test("Column surface: struct projection over a frame") {
    val spark = GraftSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("a", "café".getBytes(UTF_8), "text/html; charset=utf-8"),
      ("b", "café".getBytes(ISO_8859_1),
        "text/html; charset=windows-1252"),
      ("c", "café".getBytes(ISO_8859_1), null))
      .toDF("id", "payload", "ct")
    val got = rows.select(col("id"),
      CharsetDecode.detectCharset(col("payload"), col("ct")).as("cs"),
      CharsetDecode.decodePayload(col("payload"), col("ct")).as("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(got("a") == (("UTF-8", "café")))
    assert(got("b") == (("windows-1252", "café")))
    assert(got("c") == (("windows-1252", "café"))) // invalid UTF-8 default
  }
}
