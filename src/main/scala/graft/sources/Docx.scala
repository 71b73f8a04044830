package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * DOCX (OOXML WordprocessingML) text extraction — the other document
 * format real corpora carry, JDK-only by construction: the container
 * is a ZIP (`java.util.zip`), the payload is `word/document.xml`
 * (StAX, with DTD/external-entity resolution DISABLED — a crawled
 * docx is untrusted input and must not be an XXE vector).
 *
 * Extraction rules (deterministic, element-driven):
 *  - `w:p` paragraphs join with a newline; `w:br`/`w:cr` inside a
 *    run is a newline; `w:tab` is a tab;
 *  - `w:t` character runs concatenate verbatim (split runs — the
 *    normal shape after any edit history — reassemble seamlessly);
 *  - table cells (`w:tc`) join with tabs, rows with newlines;
 *  - everything else (run properties, themes, proofing marks, field
 *    instructions `w:instrText`, deleted text `w:delText`) is
 *    ignored — only displayed character data survives.
 *
 * Honest boundaries (NAMED errors): a payload that is not a ZIP
 * (legacy .doc and ENCRYPTED OOXML are OLE compound files — the
 * 0xD0CF11E0 signature is detected and named), a ZIP without
 * `word/document.xml`, and malformed XML. The Spark surface
 * quarantines failures per-row like [[Pdf.extractTexts]].
 *
 * The reference engine (parquery) has no document surface — this is
 * a training-data-pipeline extension (SURVEY §8), verified against
 * fixture archives from [[buildDocx]] (an independent writer).
 */
object Docx {

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"DOCX: $msg")

  /** Read one entry from the zip payload, or null. */
  private def zipEntry(bytes: Array[Byte], name: String): Array[Byte] = {
    if (bytes.length < 4) err("truncated payload")
    if ((bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
        (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0)
      err("OLE compound file (legacy .doc or ENCRYPTED OOXML) — " +
        "named boundary, no decryption/legacy support")
    if (!(bytes(0) == 'P' && bytes(1) == 'K')) err("not a ZIP container")
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          // bounded read: a ZIP bomb entry (KB of Deflate → multi-GB)
          // would OOM the executor — an Error the per-row quarantine
          // cannot catch — so cap like Pdf.inflate and NAME it.
          val out = new java.io.ByteArrayOutputStream(
            math.min(math.max(64, e.getSize.toInt), 1 << 20))
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) {
            if (out.size().toLong + n > Pdf.MaxDecodedBytes)
              err(s"$name exceeds ${Pdf.MaxDecodedBytes} bytes " +
                "(decompression bomb?)")
            out.write(chunk, 0, n)
            n = zin.read(chunk)
          }
          return out.toByteArray
        }
        e = zin.getNextEntry
      }
      null
    } catch {
      case ex: java.util.zip.ZipException => err(s"bad ZIP: ${ex.getMessage}")
    } finally zin.close()
  }

  /** StAX factory per thread: `newInstance()` walks the classpath's
    * provider files on EVERY call (measured ~90 µs/row in the
    * ScaleCurve family — more than the parse itself), and factory
    * instances are not specified thread-safe, so cache one per
    * executor thread. DTD and external entities stay OFF (XXE). */
  private val staxFactory =
    new ThreadLocal[javax.xml.stream.XMLInputFactory] {
      override def initialValue(): javax.xml.stream.XMLInputFactory = {
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
        f.setProperty(
          javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
          false)
        f
      }
    }

  def extractText(bytes: Array[Byte]): String = {
    val doc = zipEntry(bytes, "word/document.xml")
    if (doc == null) err("no word/document.xml entry (not a DOCX?)")
    val factory = staxFactory.get()
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    var inT = false
    var inRun = 0 // w:r nesting depth
    // per-ROW cell counters as a stack: tables nest inside cells
    // (w:tbl in w:tc is routine in real documents), and a flat
    // boolean/counter lets the inner row's end corrupt the outer
    // row's tab/newline state
    var rowCells = List.empty[Int]
    var cellDepth = 0
    try {
      val r = factory.createXMLStreamReader(
        new java.io.ByteArrayInputStream(doc))
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = true
              case "r" => inRun += 1
              // ONLY the run-level <w:tab/> is a tab CHARACTER —
              // <w:pPr><w:tabs><w:tab .../> entries with the same
              // local name are tab-stop DEFINITIONS, not text
              case "tab" => if (inRun > 0) sb.append('\t')
              case "br" | "cr" => if (inRun > 0) sb.append('\n')
              case "tr" => rowCells = 0 :: rowCells
              case "tc" =>
                rowCells match {
                  case n :: rest =>
                    if (n > 0) sb.append('\t') // cells join with tabs
                    rowCells = (n + 1) :: rest
                  case Nil => () // tc outside tr: malformed, ignore
                }
                cellDepth += 1
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "r" => inRun = math.max(0, inRun - 1)
              // paragraph breaks inside a cell would split the row
              // line — cell-internal paragraphs just concatenate
              case "p" => if (cellDepth == 0) newline()
              case "tc" => cellDepth = math.max(0, cellDepth - 1)
              case "tr" =>
                newline()
                rowCells = rowCells.drop(1)
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT) sb.append(r.getText)
          case _ => ()
        }
      }
      r.close()
    } catch {
      case e: javax.xml.stream.XMLStreamException =>
        err(s"malformed document.xml: ${e.getMessage}")
    }
    while (sb.nonEmpty && sb.charAt(sb.length - 1) == '\n')
      sb.deleteCharAt(sb.length - 1)
    sb.toString
  }

  /** `(id, docxBytes)` → `(id, text, docx_error)` with per-row
    * quarantine — [[Pdf.extractTexts]]'s shape for the other
    * document format. */
  def extractTexts(ds: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { case (id, bytes) =>
      try (id, extractText(bytes), null: String)
      catch {
        case scala.util.control.NonFatal(e) =>
          (id, null: String,
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
      }
    }.toDF("id", "text", "docx_error")
  }

  // ---------------------------------------------------------------
  // fixture writer (independent spec-valid OOXML builder)
  // ---------------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /**
   * Minimal valid DOCX: `[Content_Types].xml`, `_rels/.rels` and a
   * `word/document.xml` whose paragraphs carry `title` then `body`.
   * `splitRuns` breaks the body into per-word `w:r` runs (the shape
   * real editors produce); extraction must reassemble it seamlessly.
   */
  def buildDocx(title: String, body: String,
                splitRuns: Boolean = false): Array[Byte] = {
    val ns = "xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\""
    val bodyRuns =
      if (splitRuns)
        body.split(" ", -1).zipWithIndex.map { case (tok, i) =>
          val sp = if (i == 0) "" else
            "<w:r><w:t xml:space=\"preserve\"> </w:t></w:r>"
          s"$sp<w:r><w:t xml:space=\"preserve\">${xmlEscape(tok)}</w:t></w:r>"
        }.mkString
      else s"<w:r><w:t xml:space=\"preserve\">${xmlEscape(body)}</w:t></w:r>"
    val documentXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document $ns><w:body>
<w:p><w:r><w:t xml:space="preserve">${xmlEscape(title)}</w:t></w:r></w:p>
<w:p>$bodyRuns</w:p>
</w:body></w:document>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    Seq("[Content_Types].xml" -> contentTypes, "_rels/.rels" -> rels,
      "word/document.xml" -> documentXml).foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  /** A document.xml fragment with tabs, breaks and a 2x2 table, for
    * the structural-extraction spec. */
  private[graft] def buildStructuredDocx(): Array[Byte] = {
    val ns = "xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\""
    val documentXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document $ns><w:body>
<w:p><w:r><w:t>col a</w:t><w:tab/><w:t>col b</w:t></w:r></w:p>
<w:p><w:r><w:t>line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
<w:tbl><w:tr><w:tc><w:p><w:r><w:t>r1c1</w:t></w:r></w:p></w:tc>
<w:tc><w:p><w:r><w:t>r1c2</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>r2c1</w:t></w:r></w:p></w:tc>
<w:tc><w:p><w:r><w:t>r2c2</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>after &amp; entities &lt;ok&gt;</w:t></w:r></w:p>
</w:body></w:document>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(documentXml.getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    out.toByteArray
  }
}
