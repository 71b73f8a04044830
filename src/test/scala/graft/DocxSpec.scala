package graft

import graft.sources.Docx

/**
 * DOCX text extraction: title/body round-trips (single and split-run
 * shapes), XML entities, tabs/breaks/tables, NAMED errors (OLE
 * compound = legacy/encrypted, non-ZIP, missing document.xml,
 * malformed XML, XXE attempts), and the quarantining Spark surface.
 */
class DocxSpec extends SparkSpec {

  test("title/body round-trip, single-run and split-run shapes") {
    val cases = Seq(
      ("A Title", "plain body text"),
      ("Entities & <angles>", "body with & ampersand < less > greater"),
      ("multi  space", "a  double  and   triple   spaced body"))
    cases.foreach { case (t, b) =>
      assert(Docx.extractText(Docx.buildDocx(t, b)) == s"$t\n$b")
      assert(Docx.extractText(Docx.buildDocx(t, b, splitRuns = true)) ==
        s"$t\n$b", s"split runs: '$b'")
    }
  }

  test("structural extraction: tabs, breaks, table rows/cells") {
    val text = Docx.extractText(Docx.buildStructuredDocx())
    assert(text ==
      "col a\tcol b\n" +
      "line one\nline two\n" +
      "r1c1\tr1c2\n" +
      "r2c1\tr2c2\n" +
      "after & entities <ok>")
  }

  test("NAMED errors: OLE compound (legacy/encrypted), non-ZIP, " +
      "missing document.xml, malformed XML") {
    val ole = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte,
      0, 0, 0, 0)
    val e1 = intercept[IllegalArgumentException](Docx.extractText(ole))
    assert(e1.getMessage.contains("OLE"))
    intercept[IllegalArgumentException](
      Docx.extractText("not zipped at all".getBytes))
    // valid zip without the payload entry
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    val e3 = intercept[IllegalArgumentException](
      Docx.extractText(out.toByteArray))
    assert(e3.getMessage.contains("document.xml"))
    // malformed XML payload
    val bad = new java.io.ByteArrayOutputStream()
    val zb = new java.util.zip.ZipOutputStream(bad)
    zb.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zb.write("<w:document><unclosed".getBytes)
    zb.closeEntry(); zb.close()
    val e4 = intercept[IllegalArgumentException](
      Docx.extractText(bad.toByteArray))
    assert(e4.getMessage.contains("malformed"))
  }

  test("XXE attempt: DOCTYPE with external entity is rejected, not " +
      "resolved (crawled docx is untrusted input)") {
    val evil = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(evil)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(("""<?xml version="1.0"?>""" +
      """<!DOCTYPE d [<!ENTITY x SYSTEM "file:///etc/hostname">]>""" +
      """<w:document xmlns:w="ns"><w:body><w:p><w:r><w:t>&x;</w:t>""" +
      """</w:r></w:p></w:body></w:document>""").getBytes)
    z.closeEntry(); z.close()
    // with DTD support off this must fail as malformed, never read
    // the file
    val e = intercept[IllegalArgumentException](
      Docx.extractText(evil.toByteArray))
    assert(e.getMessage.contains("malformed"))
  }

  test("Spark surface quarantines failed payloads per-row") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Docx.buildDocx("t1", "body one")),
      (2L, "garbage".getBytes),
      (3L, Docx.buildDocx("t3", "body three", splitRuns = true)))
    val out = Docx.extractTexts(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "t1\nbody one", null)))
    assert(out(1)._2 == null && out(1)._3 != null)
    assert(out(2) == ((3L, "t3\nbody three", null)))
  }
}
