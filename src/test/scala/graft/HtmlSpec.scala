package graft

import graft.sources.Html

/**
 * Charset sniffing for raw crawled HTML: WHATWG precedence
 * (BOM > transport > meta prescan > UTF-8), JDK charset resolution
 * with NAMED errors for unknown declarations, U+FFFD replacement on
 * torn byte sequences, and the quarantining Spark surface.
 */
class HtmlSpec extends SparkSpec {

  private def b(s: String, cs: String) = s.getBytes(cs)

  test("BOMs win over everything and are stripped") {
    val doc = "<html><body>héllo</body></html>"
    val u8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ b(doc, "UTF-8")
    // a lying meta must NOT override the BOM
    val lying = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      b("<meta charset=\"shift_jis\">" + doc, "UTF-8")
    assert(Html.decodeHtmlBytes(u8) == doc)
    assert(Html.decodeHtmlBytes(lying).endsWith(doc))
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ b(doc, "UTF-16LE")
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ b(doc, "UTF-16BE")
    assert(Html.decodeHtmlBytes(le) == doc)
    assert(Html.decodeHtmlBytes(be) == doc)
  }

  test("transport charset beats the meta declaration (the standard's " +
      "order); meta beats the default; default is UTF-8") {
    val text = "ça va ümlaut"
    // meta says windows-1252 and the bytes ARE windows-1252
    val meta1252 = b("<html><head><meta charset=\"windows-1252\"></head>" +
      s"<body>$text</body></html>", "windows-1252")
    assert(Html.decodeHtmlBytes(meta1252).contains(text))
    // decoding the same bytes as UTF-8 would have mangled them
    assert(!new String(meta1252, "UTF-8").contains(text))
    // http-equiv form
    val metaHttpEquiv = b("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head>" +
      s"<body>$text</body></html>", "windows-1252")
    assert(Html.decodeHtmlBytes(metaHttpEquiv).contains(text))
    // transport says iso-8859-1; the lying meta says utf-8: the bytes
    // are latin-1, so only transport precedence decodes them right
    val lying = b("<html><head><meta charset=\"utf-8\"></head>" +
      s"<body>$text</body></html>", "ISO-8859-1")
    assert(Html.decodeHtmlBytes(lying, "text/html; charset=iso-8859-1")
      .contains(text))
    // shift_jis via meta
    val sj = b("<html><head><meta charset=\"shift_jis\"></head>" +
      "<body>日本語</body></html>", "shift_jis")
    assert(Html.decodeHtmlBytes(sj).contains("日本語"))
    // no signal at all: UTF-8
    assert(Html.decodeHtmlBytes(b("<p>naked ünïcode</p>", "UTF-8"))
      == "<p>naked ünïcode</p>")
  }

  test("meta-declared UTF-16 is treated as UTF-8 (the meta itself was " +
      "ASCII-readable, so UTF-16 cannot be true)") {
    val doc = "<meta charset=\"utf-16\"><body>plain</body>"
    assert(Html.decodeHtmlBytes(b(doc, "UTF-8")) == doc)
  }

  test("unknown declared charsets are NAMED errors; torn sequences " +
      "decode with U+FFFD, never fail") {
    val e = intercept[IllegalArgumentException](Html.decodeHtmlBytes(
      b("<meta charset=\"klingon-8\"><body>x</body>", "UTF-8")))
    assert(e.getMessage.contains("klingon-8"))
    val e2 = intercept[IllegalArgumentException](Html.decodeHtmlBytes(
      b("<body>x</body>", "UTF-8"), "text/html; charset=not/real"))
    assert(e2.getMessage.contains("not supported"))
    // torn multi-byte sequence under UTF-8: replacement, not failure
    val torn = b("<body>é", "UTF-8").dropRight(1)
    assert(Html.decodeHtmlBytes(torn).contains("�"))
  }

  test("meta prescan only reads the first 1024 bytes (a late meta in " +
      "a big head is ignored, per the standard's prescan bound)") {
    val pad = "<!--" + ("x" * 1100) + "-->"
    val doc = pad + "<meta charset=\"windows-1252\"><body>café</body>"
    // bytes are windows-1252 but the declaration sits past the bound:
    // decoded as UTF-8 default, the é byte becomes U+FFFD
    assert(Html.decodeHtmlBytes(b(doc, "windows-1252"))
      .contains("caf�"))
  }

  test("Spark surface quarantines unsupported charsets per-row") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, b("<meta charset=\"windows-1252\"><p>déjà</p>", "windows-1252"),
        null),
      (2L, b("<meta charset=\"martian\"><p>x</p>", "UTF-8"), null),
      (3L, b("<p>plain</p>", "UTF-8"), null))
    val out = Html.decodeAll(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0)._2.contains("déjà") && out(0)._3 == null)
    assert(out(1)._2 == null && out(1)._3.contains("martian"))
    assert(out(2) == ((3L, "<p>plain</p>", null)))
  }
}
