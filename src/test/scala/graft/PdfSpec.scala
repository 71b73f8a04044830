package graft

import graft.sources.Pdf

/**
 * PDF text extraction: the three xref layouts (classic table, classic
 * + Flate content, xref stream + ObjStm), literal-string escapes, TJ
 * kerning spaces, multi-page walks with /Resources inheritance,
 * incremental-update /Prev chains, /Differences + uniXXXX decoding,
 * ToUnicode CMaps (the Type0 path), ASCIIHex/ASCII85 filters, NAMED
 * errors (encrypted, LZW, CID-without-ToUnicode), truncation/garbage
 * fuzz, and the quarantining Spark surface.
 */
class PdfSpec extends SparkSpec {

  /** classic-xref assembler for hand-built documents: (num, body)
    * pairs in order 1..n; body is everything between "N 0 obj" and
    * "endobj". Returns (bytes, xrefOffset). */
  private def classic(objs: Seq[Array[Byte]],
                      trailerExtra: String = ""): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offs = objs.zipWithIndex.map { case (b, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n")
      out.write(b, 0, b.length)
      w("\nendobj\n")
      off
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R$trailerExtra >>\n")
    w(s"startxref\n$xref\n%%EOF\n")
    (out.toByteArray, xref)
  }

  private def s2b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def onePageObjs(fontBody: String, content: Array[Byte],
                          contentDictExtra: String = ""): Seq[Array[Byte]] = Seq(
    s2b("<< /Type /Catalog /Pages 2 0 R >>"),
    s2b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    s2b("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> " +
      "/Contents 4 0 R >>"),
    s2b(s"<< /Length ${content.length}$contentDictExtra >>\nstream\n") ++
      content ++ s2b("\nendstream"),
    s2b(fontBody))

  test("all three builder variants extract to exactly title\\nbody, " +
      "including parens, backslashes and runs of spaces") {
    val cases = Seq(
      ("Title one", "plain body text"),
      ("T(paren)s", "body with (nested (parens)) and \\ backslash"),
      ("multi  space", "a  double  and   triple   spaced body"))
    for ((t, b) <- cases; v <- 0 to 2) {
      val pdf = Pdf.buildPdf(t, b, v)
      assert(Pdf.extractText(pdf) == s"$t\n$b", s"variant $v, title '$t'")
    }
  }

  test("multi-page document walks the page tree in order; resources " +
      "inherit from the /Pages node") {
    val content1 = s2b("BT /F1 12 Tf 72 720 Td (page one) Tj ET")
    val content2 = s2b("BT /F1 12 Tf 72 720 Td (page two) Tj ET")
    val objs = Seq(
      s2b("<< /Type /Catalog /Pages 2 0 R >>"),
      // resources declared ONCE here, inherited by both pages
      s2b("<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 " +
        "/Resources << /Font << /F1 7 0 R >> >> >>"),
      s2b("<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
      s2b("<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
      s2b(s"<< /Length ${content1.length} >>\nstream\n") ++ content1 ++
        s2b("\nendstream"),
      s2b(s"<< /Length ${content2.length} >>\nstream\n") ++ content2 ++
        s2b("\nendstream"),
      s2b("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val (pdf, _) = classic(objs)
    assert(Pdf.extractText(pdf) == "page one\npage two")
  }

  test("incremental update (/Prev chain): the NEWEST xref section " +
      "wins for overridden objects") {
    val (base, oldXref) = {
      val content = s2b("BT /F1 12 Tf 72 720 Td (original text) Tj ET")
      classic(onePageObjs(
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", content))
    }
    assert(Pdf.extractText(base) == "original text")
    // append an updated content object 4 + a one-entry xref section
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val newContent = s2b("BT /F1 12 Tf 72 720 Td (updated text) Tj ET")
    val objOff = out.size()
    w(s"4 0 obj\n<< /Length ${newContent.length} >>\nstream\n")
    out.write(newContent, 0, newContent.length)
    w("\nendstream\nendobj\n")
    val xref = out.size()
    w(s"xref\n4 1\n")
    w(f"$objOff%010d 00000 n \n")
    w(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $oldXref >>\n")
    w(s"startxref\n$xref\n%%EOF\n")
    assert(Pdf.extractText(out.toByteArray) == "updated text")
  }

  test("/Differences remaps codes through glyph names and uniXXXX") {
    // codes 65/66 ('A'/'B') remapped: A -> "0" (/zero), B -> U+0042
    // via the uniXXXX convention (identity here, proving the path)
    val content = s2b("BT /F1 12 Tf 72 720 Td (AB c) Tj ET")
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding " +
      "/Differences [65 /zero /uni0058] >> >>"
    val (pdf, _) = classic(onePageObjs(font, content))
    assert(Pdf.extractText(pdf) == "0X c")
  }

  test("Type0 font WITH ToUnicode decodes 2-byte codes; without it, " +
      "a NAMED error") {
    val cmap = s2b("""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
/CMapName /Adobe-Identity-UCS def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <0069>
endbfchar
1 beginbfrange
<0010> <0012> <0041>
endbfrange
endcmap
CMap defined
end
end""")
    val content = s2b("BT /F1 12 Tf 72 720 Td <00010002> Tj 0 -14 Td " +
      "<001000110012> Tj ET")
    val objs = Seq(
      s2b("<< /Type /Catalog /Pages 2 0 R >>"),
      s2b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      s2b("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> " +
        "/Contents 4 0 R >>"),
      s2b(s"<< /Length ${content.length} >>\nstream\n") ++ content ++
        s2b("\nendstream"),
      s2b("<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
        "/ToUnicode 6 0 R >>"),
      s2b(s"<< /Length ${cmap.length} >>\nstream\n") ++ cmap ++
        s2b("\nendstream"))
    val (pdf, _) = classic(objs)
    assert(Pdf.extractText(pdf) == "Hi\nABC")
    // same document, ToUnicode dropped → named boundary
    val objsNoTu = objs.updated(4,
      s2b("<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H >>"))
    val (bad, _) = classic(objsNoTu)
    val e = intercept[IllegalArgumentException](Pdf.extractText(bad))
    assert(e.getMessage.contains("ToUnicode"))
  }

  test("ASCIIHexDecode and ASCII85Decode content streams decode; " +
      "LZW is a NAMED error") {
    val plain = "BT /F1 12 Tf 72 720 Td (hex text) Tj ET"
    val hex = plain.getBytes("ISO-8859-1")
      .map(b => f"$b%02X").mkString(" ") + ">"
    val font = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val (pdfHex, _) = classic(onePageObjs(font, s2b(hex),
      " /Filter /ASCIIHexDecode"))
    assert(Pdf.extractText(pdfHex) == "hex text")
    // ASCII85: encode by hand
    def a85(data: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < data.length) {
        val chunk = data.slice(i, i + 4)
        val pad = 4 - chunk.length
        val full = chunk ++ Array.fill(pad)(0.toByte)
        var acc = 0L
        full.foreach(b => acc = (acc << 8) | (b & 0xFF))
        val cs = (0 until 5).map(k =>
          ('!' + (acc / math.pow(85, 4 - k).toLong % 85)).toChar)
        sb.append(cs.take(5 - pad).mkString)
        i += 4
      }
      sb.append("~>")
      sb.toString
    }
    val plain85 = "BT /F1 12 Tf 72 720 Td (a85 text) Tj ET"
    val (pdf85, _) = classic(onePageObjs(font, s2b(a85(s2b(plain85))),
      " /Filter /ASCII85Decode"))
    assert(Pdf.extractText(pdf85) == "a85 text")
    val plainLzw = "BT /F1 12 Tf 72 720 Td (lzw text) Tj ET"
    val (pdfLzw, _) = classic(onePageObjs(font,
      Pdf.lzwEncode(s2b(plainLzw)), " /Filter /LZWDecode"))
    assert(Pdf.extractText(pdfLzw) == "lzw text")
    // an image-codec filter stays a NAMED boundary
    val (pdfDct, _) = classic(onePageObjs(font, s2b("xx"),
      " /Filter /DCTDecode"))
    val e = intercept[IllegalArgumentException](Pdf.extractText(pdfDct))
    assert(e.getMessage.contains("DCTDecode"))
  }

  test("LZW round-trips across the width-change boundaries, the KwKwK " +
      "self-reference, a full-table Clear cycle, and EarlyChange=0") {
    def rt(data: Array[Byte], early: Int): Unit = {
      val enc = Pdf.lzwEncode(data, early)
      assert(Pdf.lzwDecode(enc, early).sameElements(data),
        s"round-trip failed (early=$early, n=${data.length})")
    }
    // KwKwK: runs of one byte force code == size at the decoder
    rt("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa".getBytes, 1)
    // pseudo-random bytes long enough to cross the 9→10→11→12 width
    // boundaries AND overflow the 4096-entry table (forcing a mid-
    // stream Clear): ~40k entries of churn
    val rnd = new scala.util.Random(7)
    val big = Array.fill[Byte](60000)(rnd.nextInt(256).toByte)
    rt(big, 1)
    rt(big, 0) // EarlyChange=0 shifts every width boundary by one
    rt(Array.empty[Byte], 1)
    rt(Array[Byte](42), 1)
    // text-like data (low entropy, long dictionary strings)
    rt(("the quick brown fox " * 3000).getBytes, 1)
    // truncation never hangs: every prefix errs or decodes cleanly
    val enc = Pdf.lzwEncode(big.take(2000), 1)
    (0 until enc.length by 7).foreach { n =>
      try { Pdf.lzwDecode(enc.take(n), 1); () }
      catch { case _: IllegalArgumentException => () }
    }
    // EOD-on-a-width-boundary: when the LAST data code lands exactly
    // on entry 511/1023 the decoder is no longer one entry behind the
    // encoder, so an encoder syncing width off its own table writes
    // the EOD one bit narrow (the doc-138 corruption this sweep
    // generalizes). Exhaustive length sweep across both boundaries,
    // mostly-unique pairs so data codes ≈ bytes.
    for (early <- 0 to 1; n <- (240 to 280) ++ (750 to 790)) {
      val data = Array.tabulate[Byte](n)(i => ((i * 37) % 251).toByte)
      val e2 = Pdf.lzwEncode(data, early)
      assert(Pdf.lzwDecode(e2, early).sameElements(data),
        s"boundary sweep failed at n=$n early=$early")
    }
  }

  test("EXTERNAL anchor: lzwDecode decodes a JDK-ImageIO-written " +
      "LZW-compressed TIFF strip bit-exactly (an encoder we did not " +
      "write, so an encoder/decoder bug pair cannot cancel)") {
    val wpx = 64; val hpx = 40
    val img = new java.awt.image.BufferedImage(wpx, hpx,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(3)
    for (y <- 0 until hpx; x <- 0 until wpx)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(200))
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    val b = bos.toByteArray
    // minimal TIFF IFD walk (big- or little-endian)
    val little = b(0) == 'I'
    def u16(o: Int) = if (little) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int) = if (little) u16(o).toLong | (u16(o + 2).toLong << 16)
      else (u16(o).toLong << 16) | u16(o + 2).toLong
    val ifd = u32(4).toInt
    val n = u16(ifd)
    var comp = -1L; var stripOff = -1L; var stripLen = -1L; var pred = 1L
    for (i <- 0 until n) {
      val e = ifd + 2 + 12 * i
      val (tag, typ, v) = (u16(e), u16(e + 2), u32(e + 8))
      val sv = if (typ == 3) (if (little) v & 0xFFFF else v >> 16) else v
      tag match {
        case 259 => comp = sv
        case 273 => stripOff = sv
        case 279 => stripLen = sv
        case 317 => pred = sv
        case _ => ()
      }
    }
    assert(comp == 5, s"writer must have used LZW (got $comp)")
    assert(pred == 1, s"test assumes no predictor (got $pred)")
    val strip = java.util.Arrays.copyOfRange(b, stripOff.toInt,
      (stripOff + stripLen).toInt)
    val decoded = Pdf.lzwDecode(strip, 1) // TIFF LZW is early-change
    val raster = new Array[Byte](wpx * hpx)
    img.getRaster.getDataElements(0, 0, wpx, hpx, raster)
    assert(decoded.sameElements(raster),
      "decoded strip must equal the raster bit-exactly")
  }

  test("RunLength round-trips runs/literals/boundaries and the " +
      "RunLength→LZW filter CHAIN extracts through buildPdf variant 4") {
    def rt(data: Array[Byte]): Unit = {
      val enc = Pdf.runLengthEncode(data)
      assert(Pdf.runLengthDecode(enc).sameElements(data))
    }
    rt(Array.empty[Byte])
    rt("abc".getBytes)
    rt(Array.fill[Byte](500)(7)) // long run: split at 128
    rt("aabbbbbbbbccdddddddddddddddddddddddddddddx".getBytes)
    val rnd = new scala.util.Random(11)
    rt(Array.fill[Byte](4000)(rnd.nextInt(3).toByte))
    // the new buildPdf variants extract exactly like the old three
    (3 to 4).foreach { v =>
      val pdf = Pdf.buildPdf("lzw title", "lzw body text", v)
      assert(Pdf.extractText(pdf) == "lzw title\nlzw body text",
        s"variant $v")
    }
  }

  test("encrypted documents are a NAMED error, checked before any " +
      "object decryption would be needed") {
    val content = s2b("BT /F1 12 Tf 72 720 Td (secret) Tj ET")
    val (pdf, _) = classic(onePageObjs(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", content),
      trailerExtra = " /Encrypt 9 0 R")
    val e = intercept[IllegalArgumentException](Pdf.extractText(pdf))
    assert(e.getMessage.contains("encrypted"))
  }

  test("xref recovery: broken startxref and corrupted xref tables " +
      "still extract (the crawled/torn-download shape)") {
    // classic layout: garbage startxref offset
    val classic = Pdf.buildPdf("rec title", "rec body", 0)
    val s0 = new String(classic, "ISO-8859-1")
    val broken0 = s0.replaceAll("startxref\n\\d+", "startxref\n999999999")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(broken0) == "rec title\nrec body")
    // classic layout: xref table body corrupted (offsets zeroed)
    val broken1 = s0.replaceAll("\\n(\\d{10}) 00000 n ", "\n0000000000 00000 n ")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(broken1) == "rec title\nrec body")
    // xref-stream layout (ObjStm objects): garbage startxref —
    // recovery must find /Root on the XRef stream dict and the
    // catalog inside the object stream
    val modern = Pdf.buildPdf("rec title", "rec body", 2)
    val s2 = new String(modern, "ISO-8859-1")
    val broken2 = s2.replaceAll("startxref\n\\d+", "startxref\n123")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(broken2) == "rec title\nrec body")
    // incremental-update recovery honors last-occurrence-wins
    val out = new java.io.ByteArrayOutputStream()
    out.write(broken0, 0, broken0.length)
    val upd = "4 0 obj\n<< /Length 47 >>\nstream\n" +
      "BT /F1 12 Tf 72 720 Td (updated by scan) Tj ET" +
      "\nendstream\nendobj\n"
    out.write(upd.getBytes("ISO-8859-1"))
    assert(Pdf.extractText(out.toByteArray) == "updated by scan")
  }

  test("a dangling reference reads as null WITHOUT discarding the " +
      "valid xref; reference cycles are NAMED errors, not stack death") {
    // dangling: the page carries /Annots 9 0 R where object 9 does
    // not exist — spec-defined null, extraction proceeds
    val content = s2b("BT /F1 12 Tf 72 720 Td (dangle ok) Tj ET")
    val objs = Seq(
      s2b("<< /Type /Catalog /Pages 2 0 R >>"),
      s2b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      s2b("<< /Type /Page /Parent 2 0 R /Annots 9 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      s2b(s"<< /Length ${content.length} >>\nstream\n") ++ content ++
        s2b("\nendstream"),
      s2b("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val (pdf, _) = classic(objs)
    assert(Pdf.extractText(pdf) == "dangle ok")
    // cycle: /Contents 6 0 R -> 7 0 R -> 6 0 R must surface as a
    // named IllegalArgumentException (quarantinable), never a
    // StackOverflowError
    val objsCycle = Seq(
      s2b("<< /Type /Catalog /Pages 2 0 R >>"),
      s2b("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      s2b("<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 6 0 R >>"),
      s2b(s"<< /Length ${content.length} >>\nstream\n") ++ content ++
        s2b("\nendstream"),
      s2b("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      s2b("7 0 R"),
      s2b("6 0 R"))
    val (cyc, _) = classic(objsCycle)
    val e = intercept[IllegalArgumentException](Pdf.extractText(cyc))
    assert(e.getMessage.contains("cycle"))
  }

  test("truncation and garbage never hang or silently succeed") {
    val good = Pdf.buildPdf("a title", "a body", 2)
    // (cutting only the %%EOF comment still parses — by design; these
    // cuts all remove real structure: xref data, stream bodies, keys)
    Seq(10, good.length / 3, good.length / 2, good.length - 60).foreach { n =>
      intercept[Exception](Pdf.extractText(good.take(n)))
    }
    intercept[Exception](Pdf.extractText("not a pdf at all".getBytes))
    intercept[Exception](Pdf.extractText(Array[Byte]()))
  }

  test("100k nested arrays err as a NAMED nesting error, not a fatal " +
      "StackOverflowError that escapes the per-row quarantine") {
    val deep = s2b("<< /Type /Catalog /Pages 2 0 R /Junk ") ++
      Array.fill(100000)('['.toByte) ++
      Array.fill(100000)(']'.toByte) ++ s2b(" >>")
    val (pdf, _) = classic(Seq(
      deep,
      s2b("<< /Type /Pages /Kids [] /Count 0 >>")))
    // the depth guard errs inside the object parse; the xref-recovery
    // path (correctly) treats that object as unreadable and the file
    // surfaces as a NAMED bad-catalog error. The real pin is the
    // exception TYPE: without the guard this dies StackOverflowError,
    // which is fatal and fails the intercept below.
    val e = intercept[IllegalArgumentException](Pdf.extractText(pdf))
    assert(e.getMessage.contains("nesting") ||
      e.getMessage.contains("bad catalog"), e.getMessage)
  }

  test("a FlateDecode decompression bomb errs NAMED at the output cap " +
      "instead of OOMing the executor") {
    // ~300 MiB of zeros deflates to ~300 KB; inflating it would blow
    // past any reasonable stream size. The cap must throw the named
    // IllegalArgumentException (quarantinable), never OutOfMemoryError.
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_COMPRESSION)
    val bomb = new java.io.ByteArrayOutputStream()
    val zeros = new Array[Byte](1 << 16)
    val buf = new Array[Byte](1 << 16)
    var fed = 0L
    while (fed < (300L << 20)) {
      defl.setInput(zeros)
      while (!defl.needsInput()) bomb.write(buf, 0, defl.deflate(buf))
      fed += zeros.length
    }
    defl.finish()
    while (!defl.finished()) bomb.write(buf, 0, defl.deflate(buf))
    defl.end()
    val content = bomb.toByteArray
    val (pdf, _) = classic(onePageObjs(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      content, " /Filter /FlateDecode"))
    val e = intercept[IllegalArgumentException](Pdf.extractText(pdf))
    assert(e.getMessage.contains("bomb"), e.getMessage)
  }

  test("Spark surface quarantines failed payloads with the named " +
      "error instead of failing the job") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Pdf.buildPdf("t1", "body one", 0)),
      (2L, "garbage".getBytes),
      (3L, Pdf.buildPdf("t3", "body three", 2)))
    val out = Pdf.extractTexts(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "t1\nbody one", null)))
    assert(out(1)._2 == null && out(1)._3 != null)
    assert(out(2) == ((3L, "t3\nbody three", null)))
  }
}
