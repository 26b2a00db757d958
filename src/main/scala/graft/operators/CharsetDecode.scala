package graft.operators

import java.nio.charset.{Charset, CodingErrorAction}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Charset-aware payload decoding — the single most common real-crawl
  * correctness hazard: several percent of the web is NOT UTF-8
  * (windows-125x, Shift_JIS, GBK, ISO-8859-*), and decoding those
  * pages as UTF-8 silently mojibakes them before extraction, langid,
  * dedup, and the WET sink ever see the text.
  *
  * Detection order (the WHATWG encoding-sniffing algorithm, restated
  * for a batch engine that holds the full payload):
  *   1. a UTF-8 / UTF-16 byte-order mark wins over everything (and is
  *      stripped from the output);
  *   2. the transport `charset=` parameter of the Content-Type header;
  *   3. a prescan of the first 1024 bytes for `<meta charset=…>` /
  *      `<meta http-equiv=content-type content="…charset=…">` — an
  *      in-document utf-16 declaration is read as UTF-8 per the WHATWG
  *      rule (the prescan only ever sees it in an 8-bit document);
  *   4. strict UTF-8 validation of the whole payload: valid → UTF-8.
  *      This step is a deliberate, documented DEVIATION from the pure
  *      HTML5 locale default — a browser streams and cannot look
  *      ahead, a batch pipeline can, and an undeclared page that
  *      validates as UTF-8 virtually always IS UTF-8 (cp125x text with
  *      non-ASCII almost never forms valid UTF-8 sequences);
  *   5. windows-1252, the HTML5 default for the no-information case.
  *
  * Labels normalize per the WHATWG encoding registry's alias table
  * (subset): the latin1/ascii family maps to windows-1252 (its
  * superset, the WHATWG mapping), the shift_jis family to Shift_JIS,
  * the gb family to GBK, and anything else Java supports passes
  * through. Unknown labels fall through to the next detection step
  * rather than erroring. Decoding REPLACEs malformed input — the
  * kernel never throws on hostile bytes.
  *
  * The kernel is a deliberate scalar UDF: per-row charset selection
  * has no Column form (`decode(col, cs)` takes a literal charset), and
  * the work is narrow per-row CPU — no shuffle, no state, scale-safe.
  */
object CharsetDecode {

  /** WHATWG label → canonical charset name; null = unknown label. */
  private[graft] def normalizeLabel(label: String): String = {
    if (label == null) return null
    val l = label.trim.toLowerCase
    if (l.isEmpty) return null
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" | "x-unicode20utf8" =>
        "UTF-8"
      case "utf-16" | "utf-16le" | "unicode" | "csunicode" | "ucs-2" =>
        "UTF-16LE" // WHATWG: BOM-less utf-16 defaults little-endian
      case "utf-16be" => "UTF-16BE"
      case "iso-8859-1" | "iso8859-1" | "iso_8859-1" | "latin1" | "l1" |
           "ascii" | "us-ascii" | "windows-1252" | "cp1252" |
           "x-cp1252" | "ansi_x3.4-1968" | "cp819" | "ibm819" |
           "iso-ir-100" | "csisolatin1" => "windows-1252"
      case "shift_jis" | "shift-jis" | "sjis" | "ms_kanji" |
           "csshiftjis" | "x-sjis" | "windows-31j" | "ms932" =>
        "Shift_JIS"
      case "gbk" | "gb2312" | "gb_2312" | "gb_2312-80" | "x-gbk" |
           "chinese" | "csgb2312" | "csiso58gb231280" | "iso-ir-58" =>
        "GBK"
      case "gb18030" => "GB18030"
      case "big5" | "big5-hkscs" | "cn-big5" | "x-x-big5" | "csbig5" =>
        "Big5"
      case "euc-jp" | "x-euc-jp" | "cseucpkdfmtjapanese" => "EUC-JP"
      case "euc-kr" | "korean" | "ks_c_5601-1987" | "csksc56011987" |
           "iso-ir-149" | "windows-949" | "cseuckr" => "EUC-KR"
      case "iso-8859-15" | "iso8859-15" | "latin9" | "l9" |
           "csisolatin9" => "ISO-8859-15"
      case other =>
        try {
          if (Charset.isSupported(other)) Charset.forName(other).name()
          else null
        } catch { case _: Exception => null }
    }
  }

  /** `charset=` parameter of a Content-Type value (RFC 9110 §8.3):
    * case-insensitive key, optional quotes, first occurrence wins. */
  private[graft] def headerCharset(contentType: String): String = {
    if (contentType == null) return null
    val lc = contentType.toLowerCase
    var i = lc.indexOf("charset")
    while (i >= 0) {
      var j = i + 7
      while (j < lc.length && lc.charAt(j) == ' ') j += 1
      if (j < lc.length && lc.charAt(j) == '=') {
        j += 1
        while (j < lc.length && lc.charAt(j) == ' ') j += 1
        val quoted = j < lc.length &&
          (lc.charAt(j) == '"' || lc.charAt(j) == '\'')
        val quote = if (quoted) lc.charAt(j) else ' '
        if (quoted) j += 1
        val start = j
        while (j < lc.length && (if (quoted) lc.charAt(j) != quote
          else lc.charAt(j) != ';' && lc.charAt(j) != ' '
            && lc.charAt(j) != ',')) j += 1
        val v = contentType.substring(start, j).trim
        return if (v.isEmpty) null else v
      }
      i = lc.indexOf("charset", i + 7)
    }
    null
  }

  /** WHATWG prescan window. */
  private val PrescanBytes = 1024

  private val MetaCharset = java.util.regex.Pattern.compile(
    """(?is)<meta[^>]{0,512}?charset\s*=\s*["']?([a-z0-9._:+\-]+)""")

  /** `<meta charset=…>` (or the http-equiv content form — both carry a
    * `charset=` token inside the tag) within the first 1024 bytes,
    * read as ISO-8859-1 so every byte maps to one char. */
  private[graft] def metaCharset(bytes: Array[Byte]): String = {
    val n = math.min(bytes.length, PrescanBytes)
    if (n == 0) return null
    val window = new String(bytes, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = MetaCharset.matcher(window)
    if (m.find()) m.group(1) else null
  }

  /** Strict UTF-8 validation (RFC 3629 DFA): overlongs, surrogates,
    * and >U+10FFFF all reject. One pass, no allocation. */
  private[graft] def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xc2) return false // continuation or overlong lead
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (b0 < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        val lo = if (b0 == 0xe0) 0xa0 else 0x80 // overlong guard
        val hi = if (b0 == 0xed) 0x9f else 0xbf // surrogate guard
        if (b1 < lo || b1 > hi || (bytes(i + 2) & 0xc0) != 0x80)
          return false
        i += 3
      } else if (b0 < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        val lo = if (b0 == 0xf0) 0x90 else 0x80
        val hi = if (b0 == 0xf4) 0x8f else 0xbf
        if (b1 < lo || b1 > hi || (bytes(i + 2) & 0xc0) != 0x80
          || (bytes(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
    }
    true
  }

  /** Detection kernel: (canonical charset name, BOM bytes to skip). */
  private[graft] def sniff(bytes: Array[Byte], contentType: String)
      : (String, Int) = {
    if (bytes == null || bytes.length == 0) return ("UTF-8", 0)
    // 1. BOM (WHATWG set) — wins over any declaration, and strips
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef
        && (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return ("UTF-8", 3)
    if (bytes.length >= 2) {
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      if (b0 == 0xfe && b1 == 0xff) return ("UTF-16BE", 2)
      if (b0 == 0xff && b1 == 0xfe) return ("UTF-16LE", 2)
    }
    // 2. transport header
    val fromHeader = normalizeLabel(headerCharset(contentType))
    if (fromHeader != null) return (fromHeader, 0)
    // 3. meta prescan; an in-document utf-16 label means utf-8 (WHATWG)
    val fromMeta = normalizeLabel(metaCharset(bytes)) match {
      case "UTF-16LE" | "UTF-16BE" => "UTF-8"
      case other => other
    }
    if (fromMeta != null) return (fromMeta, 0)
    // 4. whole-payload UTF-8 validity (documented deviation — see top)
    if (isValidUtf8(bytes)) return ("UTF-8", 0)
    // 5. the HTML5 no-information default
    ("windows-1252", 0)
  }

  /** Decode with REPLACE on malformed/unmappable — never throws. */
  private[graft] def decodeWith(bytes: Array[Byte], offset: Int,
      charset: String): String = {
    val cs = try Charset.forName(charset) catch {
      case _: Exception => java.nio.charset.StandardCharsets.UTF_8
    }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    try dec.decode(java.nio.ByteBuffer.wrap(
      bytes, offset, bytes.length - offset)).toString
    catch { case _: Exception => "" } // defensive: REPLACE covers all
  }

  /** Full kernel: (detected charset name, decoded text). */
  private[graft] def detectAndDecode(bytes: Array[Byte],
      contentType: String): (String, String) = {
    if (bytes == null) return (null, null)
    val (cs, skip) = sniff(bytes, contentType)
    (cs, decodeWith(bytes, skip, cs))
  }

  private val decodedUdf = udf((payload: Array[Byte], ct: String) =>
    detectAndDecode(payload, ct))

  /** struct<charset string, text string> — detection + decode in ONE
    * kernel call so a query projecting both fields pays once. */
  def charsetDecoded(payload: Column, contentType: Column): Column =
    decodedUdf(payload, contentType)
      .cast("struct<charset: string, text: string>")

  /** Decoded text under the sniffed charset. */
  def decodePayload(payload: Column, contentType: Column): Column =
    charsetDecoded(payload, contentType).getField("text")

  /** The sniffed charset name alone (audit / corpus reporting). */
  def detectCharset(payload: Column, contentType: Column): Column =
    charsetDecoded(payload, contentType).getField("charset")
}
