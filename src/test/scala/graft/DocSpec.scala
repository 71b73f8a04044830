package graft

import graft.sources.{Doc, Docx}

/**
 * Legacy .doc (Word 97 binary) extraction: CFB container walk (FAT
 * for the ≥4096-byte WordDocument stream, mini-FAT for the small
 * table stream — the fixture exercises BOTH paths on every build),
 * FIB structural parse, Clx/piece-table text reassembly across 8-bit
 * (cp1252) and 16-bit (UTF-16LE) pieces, control-character mapping,
 * NAMED boundaries (encrypted, fast-saved), and truncation/garbage
 * fuzz that must never hang or silently succeed.
 */
class DocSpec extends SparkSpec {

  test("single-piece, split-piece, and Prc-prefixed fixtures extract " +
      "to exactly title\\nbody across 8-bit and 16-bit text paths") {
    val cases = Seq(
      ("Title one", "plain body text"),
      ("T(paren)s", "body with (nested (parens)) and \\ backslash"),
      ("multi  space", "a  double  and   triple   spaced body"),
      // forces the 16-bit piece path: not cp1252-encodable
      ("日本語タイトル", "本文テキスト κείμενο текст"),
      // cp1252 high range (é, ñ) stays on the 8-bit path
      ("café", "mañana déjà vu"))
    for ((t, b) <- cases; split <- Seq(false, true);
         prc <- Seq(false, true)) {
      val doc = Doc.buildDoc(t, b, split16 = split, withPrc = prc)
      assert(Doc.extractText(doc) == s"$t\n$b",
        s"title '$t', split16=$split, withPrc=$prc")
    }
  }

  test("control characters map by the Docx element rules: cell marks " +
      "to tabs, line breaks to newlines, field instructions dropped, " +
      "placeholders dropped") {
    // paragraph with a cell mark, a line break, a field
    // (begin 0x13, instruction, separator 0x14, result, end 0x15),
    // a page break and an object placeholder
    val body = "a\u0007b\u000Bc" +
      "\u0013 HYPERLINK x \u0014shown\u0015" + "d\u000Ce\u0001f"
    val doc = Doc.buildDoc("t", body)
    assert(Doc.extractText(doc) == "t\na\tb\ncshowndef")
  }

  test("encrypted and fast-saved documents are NAMED errors, not " +
      "wrong text") {
    def withFlags(doc: Array[Byte], mask: Int): Array[Byte] = {
      // FibBase flags live at WordDocument offset 0x0A; the fixture's
      // WordDocument stream starts right after dir+miniFAT+ministream
      // sectors — find it by the FIB magic instead of hardcoding
      val out = doc.clone()
      var i = 512
      var found = -1
      while (i + 1 < out.length && found < 0) {
        if ((out(i) & 0xFF) == 0xEC && (out(i + 1) & 0xFF) == 0xA5)
          found = i
        i += 1
      }
      assert(found >= 0, "fixture must contain the FIB magic")
      val o = found + 0x0A
      out(o) = (out(o) | (mask & 0xFF)).toByte
      out(o + 1) = (out(o + 1) | (mask >> 8)).toByte
      out
    }
    val doc = Doc.buildDoc("t", "secret body")
    val enc = intercept[IllegalArgumentException](
      Doc.extractText(withFlags(doc, 0x0100)))
    assert(enc.getMessage.contains("encrypted"))
    val cplx = intercept[IllegalArgumentException](
      Doc.extractText(withFlags(doc, 0x0004)))
    assert(cplx.getMessage.contains("fast-saved"))
  }

  test("truncation and garbage never hang or silently succeed") {
    val good = Doc.buildDoc("a title", "a body")
    assert(Doc.extractText(good) == "a title\na body")
    Seq(8, 100, 512, good.length / 3, good.length / 2,
        good.length - 700).foreach { n =>
      intercept[IllegalArgumentException](Doc.extractText(good.take(n)))
    }
    intercept[IllegalArgumentException](
      Doc.extractText("not a doc at all".getBytes))
    intercept[IllegalArgumentException](Doc.extractText(Array[Byte]()))
    // a DOCX payload (ZIP) is not a CFB file — named, not misparsed
    val zip = Docx.buildDocx("t", "b")
    val e = intercept[IllegalArgumentException](Doc.extractText(zip))
    assert(e.getMessage.contains("OLE"))
    // byte-level fuzz over structure fields must err, not loop: zero
    // out each 64-byte block in turn and extract
    (0 until good.length by 64).foreach { o =>
      val fuzz = good.clone()
      java.util.Arrays.fill(fuzz, o, math.min(o + 64, fuzz.length),
        0.toByte)
      try { Doc.extractText(fuzz); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("Clx validation rejects a wrong fcClx loudly (a bad structural " +
      "constant must never decode silently wrong text)") {
    val good = Doc.buildDoc("t", "b")
    // corrupt the Clx's leading tag byte (table stream starts in the
    // mini stream; locate the Pcdt tag 0x02 followed by a plausible
    // PlcPcd length instead of hardcoding the offset)
    var i = 512
    var found = -1
    while (i + 5 < good.length && found < 0) {
      if ((good(i) & 0xFF) == 0x02 && (good(i + 1) & 0xFF) == 16 &&
          good(i + 2) == 0 && good(i + 3) == 0 && good(i + 4) == 0)
        found = i
      i += 1
    }
    assert(found > 0, "fixture must contain a single-piece Pcdt")
    val bad = good.clone()
    bad(found) = 0x77.toByte
    val e = intercept[IllegalArgumentException](Doc.extractText(bad))
    assert(e.getMessage.contains("Pcdt") || e.getMessage.contains("Clx"),
      e.getMessage)
  }

  test("a crafted FAT cycle in the directory chain is a NAMED error, " +
      "not an unbounded allocation") {
    val good = Doc.buildDoc("t", "b")
    // the header's DIFAT[0] (offset 76) names the FAT sector; entry 0
    // is the directory chain head — point it at itself
    def u32(b: Array[Byte], o: Int) =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    val fatSector = u32(good, 76)
    val fatOff = (fatSector + 1) * 512
    val bad = good.clone()
    bad(fatOff) = 0; bad(fatOff + 1) = 0; bad(fatOff + 2) = 0
    bad(fatOff + 3) = 0
    val e = intercept[IllegalArgumentException](Doc.extractText(bad))
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("cap"),
      e.getMessage)
  }

  test("Spark surface quarantines failed payloads per-row") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Doc.buildDoc("t1", "body one")),
      (2L, "garbage that is long enough to not be a header".getBytes),
      (3L, Doc.buildDoc("t3", "body three", split16 = true)))
    val out = Doc.extractTexts(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "t1\nbody one", null)))
    assert(out(1)._2 == null && out(1)._3 != null)
    assert(out(2) == ((3L, "t3\nbody three", null)))
  }
}
