package graft

import graft.sources.{Doc, Epub}

/**
 * EPUB extraction: OCF container walk (container.xml → OPF), spine
 * reading order (pinned against a fixture whose ZIP order is
 * reversed), manifest items outside the spine excluded, XHTML text
 * with script/style drops and DTD-less named-entity mapping, DRM and
 * structural NAMED boundaries, and the quarantining Spark surface.
 */
class EpubSpec extends SparkSpec {

  test("the fixture extracts in SPINE order (not ZIP order), head/css/" +
      "script content never leaks, entities map without a DTD") {
    val epub = Epub.buildEpub("My Title", "Body text of chapter two.")
    val got = Epub.extractText(epub)
    assert(got ==
      "My Title\none space and a dash—here\n" +
        "Chapter Two\nBody text of chapter two.")
    assert(!got.contains("front matter"), "head <title> must not leak")
    assert(!got.contains("var x"), "script content must not leak")
    assert(!got.contains("color"), "css must not leak")
  }

  test("unknown named entities and malformed XHTML are NAMED errors, " +
      "not dropped text; DRM is detected and named") {
    val epub = Epub.buildEpub("t", "b")
    // graft an encryption.xml on top (re-zip with the extra entry)
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(epub))
    var e = zin.getNextEntry
    while (e != null) {
      z.putNextEntry(new java.util.zip.ZipEntry(e.getName))
      z.write(zin.readAllBytes()); z.closeEntry()
      e = zin.getNextEntry
    }
    z.putNextEntry(new java.util.zip.ZipEntry("META-INF/encryption.xml"))
    z.write("<encryption/>".getBytes); z.closeEntry(); z.close()
    val drm = intercept[IllegalArgumentException](
      Epub.extractText(out.toByteArray))
    assert(drm.getMessage.contains("DRM"))
    // unknown entity
    val e2 = intercept[IllegalArgumentException](
      Epub.xhtmlText("<html><body><p>&weird;</p></body></html>"
        .getBytes("UTF-8")))
    assert(e2.getMessage.contains("weird"))
    val e3 = intercept[IllegalArgumentException](
      Epub.xhtmlText("<html><body><p>unclosed".getBytes("UTF-8")))
    assert(e3.getMessage.contains("malformed"))
  }

  test("structural boundaries are NAMED: not a zip, OLE, missing " +
      "container/OPF/spine/chapters") {
    intercept[IllegalArgumentException](Epub.extractText("x".getBytes))
    val ole = intercept[IllegalArgumentException](
      Epub.extractText(Doc.buildDoc("t", "b")))
    assert(ole.getMessage.contains("OLE"))
    // a zip that is not an epub
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    z.write("hi".getBytes); z.closeEntry(); z.close()
    val e = intercept[IllegalArgumentException](
      Epub.extractText(out.toByteArray))
    assert(e.getMessage.contains("container.xml"))
  }

  test("an archive whose entries TOGETHER blow the decode budget errs " +
      "NAMED (per-entry caps alone allow N times the cap)") {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.setLevel(9)
    val zeros = new Array[Byte](1 << 16)
    (0 until 3).foreach { i =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"part$i.bin"))
      var fed = 0L
      while (fed < (100L << 20)) { z.write(zeros); fed += zeros.length }
      z.closeEntry()
    }
    z.close()
    assert(out.size() < (2 << 20), "bomb must be small on disk")
    val e = intercept[IllegalArgumentException](
      Epub.extractText(out.toByteArray))
    assert(e.getMessage.contains("bomb"), e.getMessage)
  }

  test("Spark surface quarantines failed payloads per-row") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Epub.buildEpub("t1", "body one")),
      (2L, "garbage".getBytes),
      (3L, Epub.buildEpub("t3", "body three")))
    val out = Epub.extractTexts(spark.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0)._2.startsWith("t1\n") && out(0)._3 == null)
    assert(out(1)._2 == null && out(1)._3 != null)
    assert(out(2)._2.endsWith("body three") && out(2)._3 == null)
  }
}
