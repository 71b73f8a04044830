package graft

import graft.sources.{Doc, Rtf}

/**
 * RTF extraction: token grammar (control words/symbols, groups,
 * parameters), destination skipping (including the `\*` forward-compat
 * rule and field instruction/result), both non-ASCII escape shapes
 * (`\'hh` codepage bytes and `\uN` with group-scoped `\ucN` fallback
 * skipping), `\binN` raw-byte swallowing, NAMED boundaries, and the
 * quarantining Spark surface.
 */
class RtfSpec extends SparkSpec {

  test("fixtures extract to exactly title\\nbody across both escape " +
      "shapes; tables/info/starred destinations and field " +
      "instructions never leak") {
    val cases = Seq(
      ("Title one", "plain body text"),
      ("Braces {and} backslash \\", "nested {deep {braces}} here"),
      ("café fiancée", "mañana déjà vu résumé"),
      ("№ and Ω", "unicode ♦ beyond cp1252 ♣"))
    for ((t, b) <- cases; hex <- Seq(false, true)) {
      val rtf = Rtf.buildRtf(t, b, hexEscapes = hex)
      assert(Rtf.extractText(rtf) == s"$t\n$b",
        s"title '$t', hexEscapes=$hex")
      val s = new String(rtf, "ISO-8859-1")
      assert(!Rtf.extractText(rtf).contains("metadata title"),
        "the \\info destination must not leak")
      assert(!Rtf.extractText(rtf).contains("HYPERLINK"),
        "field instructions must not leak")
      if (!hex && t.exists(_ > 127))
        assert(s.contains("\\u"), "non-hex fixtures must use \\uN")
    }
  }

  test("uc fallback skipping is group-scoped and consumes \\'hh " +
      "fallbacks; \\bin swallows raw bytes; \\par aliases map") {
    // \uc1\u233 followed by its \'e9 ANSI fallback: one é, not two
    val r1 = "{\\rtf1\\ansi\\uc1 x\\u233\\'e9y}".getBytes("ISO-8859-1")
    assert(Rtf.extractText(r1) == "xéy")
    // \uc2 inside a group does not leak out of it
    val r2 = ("{\\rtf1\\ansi\\uc1 {\\uc2 a}\\u233 ?b}")
      .getBytes("ISO-8859-1")
    assert(Rtf.extractText(r2) == "aéb",
      "after the group closes, uc must be 1 again (one '?' consumed)")
    // negative \u wraps signed-16-bit (U+F0A7 style private use)
    val r3 = "{\\rtf1\\ansi\\uc0 a\\u-3929 b}".getBytes("ISO-8859-1")
    assert(Rtf.extractText(r3) == "ab")
    // \bin swallows exactly N bytes even if they contain } or \
    // (the 5 raw bytes here are `}}\\!`; the real pict-group close
    // follows them)
    val binBody = "{\\rtf1\\ansi a{\\pict\\bin5 }}\\\\!}b}"
    assert(Rtf.extractText(binBody.getBytes("ISO-8859-1")) == "ab")
    // \tab/\cell/\line/\row
    val r4 = "{\\rtf1\\ansi a\\tab b\\cell c\\line d\\row e}"
      .getBytes("ISO-8859-1")
    assert(Rtf.extractText(r4) == "a\tb\tc\nd\ne")
  }

  test("truncation, garbage, OLE payloads, and unknown codepages are " +
      "NAMED errors; never hangs") {
    val good = Rtf.buildRtf("a title", "a body")
    Seq(3, 20, good.length / 2, good.length - 1).foreach { n =>
      intercept[IllegalArgumentException](Rtf.extractText(good.take(n)))
    }
    intercept[IllegalArgumentException](
      Rtf.extractText("plain text, no rtf".getBytes))
    intercept[IllegalArgumentException](Rtf.extractText(Array[Byte]()))
    val ole = intercept[IllegalArgumentException](
      Rtf.extractText(Doc.buildDoc("t", "b")))
    assert(ole.getMessage.contains("OLE"))
    val cp = intercept[IllegalArgumentException](Rtf.extractText(
      "{\\rtf1\\ansi\\ansicpg99999 x}".getBytes("ISO-8859-1")))
    assert(cp.getMessage.contains("99999"))
    // byte fuzz: flip each 32nd byte; must err or succeed, never hang
    (0 until good.length by 32).foreach { o =>
      val fuzz = good.clone()
      fuzz(o) = (fuzz(o) ^ 0x55).toByte
      try { Rtf.extractText(fuzz); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("Spark surface quarantines failed payloads per-row") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Rtf.buildRtf("t1", "body one")),
      (2L, "garbage".getBytes),
      (3L, Rtf.buildRtf("t3", "body three", hexEscapes = true)))
    val out = Rtf.extractTexts(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "t1\nbody one", null)))
    assert(out(1)._2 == null && out(1)._3 != null)
    assert(out(2) == ((3L, "t3\nbody three", null)))
  }
}
