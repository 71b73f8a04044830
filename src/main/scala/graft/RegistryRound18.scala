package graft

import org.apache.spark.sql.functions._

import SparkEntry._

/** Round-18 extensions: legacy `.doc` (Word 97 binary) and RTF text
  * extraction — closing the document-format family over the formats
  * pre-2007 dumps actually carry — plus the raw-crawl ingestion path
  * (full-WARC response records and WHATWG charset sniffing ahead of
  * the HTML extract chain). Each gate shares an existing family's
  * analytic oracle construction. */
private[graft] object RegistryRound18 {

  /** ONE oracle literal for q_tar_text_ingest and (round 19) its
    * .tar.zst twin — the two gates ingest identical members through
    * identical walks, differing only in the sniffed decompressor, so
    * they must share one literal (two copies could silently drift). */
  private[graft] val tarIngestOracle =
    """SELECT doc_id, CAST(3 AS BIGINT) AS n_members,
          CAST(1 AS BIGINT) AS n_skipped,
          source || chr(10) || text || chr(10) ||
          'deep path member' AS joined
        FROM documents WHERE doc_id < 150"""

  private[graft] val entries: Seq[Q] = Seq(

    // Legacy .doc text extraction: q_pdf_extract's construction for
    // the Word 97 binary format — each document rendered into a
    // minimal spec-valid CFB container (graft.sources.Doc.buildDoc,
    // an independent writer whose every build exercises both the FAT
    // path, via the ≥4096-byte WordDocument stream, and the mini-FAT
    // path, via the small table stream), split 8/16-bit pieces on
    // odd ids (the mixed shape piece tables exist for), extracted
    // back through the CFB walk + FIB + Clx/piece table. Same
    // ANALYTIC oracle: expected text written from the source columns,
    // so a writer/parser bug pair cannot cancel
    Q("q_doc_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val doc = graft.sources.Doc.buildDoc(src, txt,
            split16 = id % 2 == 1, withPrc = id % 3 == 0)
          (id, graft.sources.Doc.extractText(doc))
        }.toDF("doc_id", "extracted")
      },
      Some("""SELECT doc_id, source || chr(10) || text AS extracted
              FROM documents WHERE doc_id < 150""")),

    // Raw-HTML charset sniffing ahead of the extract chain: each
    // document is wrapped in HTML carrying charset-stress text and
    // ENCODED to raw bytes in a rotation of real crawl shapes
    // (UTF-8+BOM / windows-1252 via <meta charset> / shift_jis via
    // <meta http-equiv> / iso-8859-1 via the Content-Type header
    // param), then decoded back through the WHATWG-precedence sniff
    // (graft.sources.Html.decodeHtmlBytes) and the standard
    // extractHtmlText chain. The oracle is ANALYTIC — expected text
    // written from the source columns plus the per-variant planted
    // suffix, so a decode that silently mangles the non-ASCII
    // characters (what UTF-8-always does to 3 of the 4 variants)
    // hash-mismatches immediately
    Q("q_html_extract_charset",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        val decoded = docs.map { case (id, src, txt) =>
          val (metaTag, suffix, charset, ct) = ((id % 4).toInt: @unchecked) match {
            case 0 => ("", "", "UTF-8", null)
            case 1 => ("<meta charset=\"windows-1252\">",
              " café déjà vu", "windows-1252", null)
            case 2 => ("<meta http-equiv=\"Content-Type\" " +
              "content=\"text/html; charset=shift_jis\">",
              " 日本語テキスト",
              "shift_jis", null)
            case 3 => ("", " ¡señor!", "ISO-8859-1",
              "text/html; charset=iso-8859-1")
          }
          val html = s"<html><head>$metaTag</head><body><h1>$src</h1>" +
            s"<p>$txt$suffix</p></body></html>"
          val enc = html.getBytes(charset)
          val raw = if (id % 4 == 0)
            Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ enc
          else enc
          (id, graft.sources.Html.decodeHtmlBytes(raw, ct))
        }.toDF("doc_id", "html")
        decoded.select(col("doc_id"),
          graft.functions.TextAnalysis.extractHtmlText(col("html"))
            .as("extracted"))
      },
      Some("""SELECT doc_id, source || chr(10) || text ||
                CASE doc_id % 4 WHEN 0 THEN ''
                  WHEN 1 THEN ' café déjà vu'
                  WHEN 2 THEN ' 日本語テキスト'
                  ELSE ' ¡señor!' END AS extracted
              FROM documents WHERE doc_id < 150""")),

    // Full-WARC raw-crawl path, end-to-end: each document becomes an
    // HTTP response inside a spec-valid WARC shard
    // (graft.sources.Warc.buildWarc — warcinfo + request + response
    // records, one gzip member per record on odd ids, the standard
    // .warc.gz layout), walked back through the Content-Length-framed
    // record reader, HTTP-split (the Content-Type header surfaces the
    // transport charset), charset-decoded (windows-1252 — bytes a
    // UTF-8-always decode would mangle), and text-extracted. Same
    // ANALYTIC oracle family as q_html_extract_charset
    Q("q_warc_extract_responses",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        val decoded = docs.map { case (id, src, txt) =>
          val html = s"<html><head></head><body><h1>$src</h1>" +
            s"<p>$txt fiancée nº $id</p></body></html>"
          val shard = graft.sources.Warc.buildWarc(
            Seq((s"http://corpus.test/$id",
              "text/html; charset=windows-1252",
              html.getBytes("windows-1252"))),
            gzipped = id % 2 == 1)
          val r = graft.sources.Warc.records(
              new java.io.ByteArrayInputStream(shard))
            .find(_.warcType == "response").get
          (id, graft.sources.Html.decodeHtmlBytes(r.payload,
            r.httpContentType))
        }.toDF("doc_id", "html")
        decoded.select(col("doc_id"),
          graft.functions.TextAnalysis.extractHtmlText(col("html"))
            .as("extracted"))
      },
      Some("""SELECT doc_id, source || chr(10) || text ||
                ' fiancée nº ' || doc_id AS extracted
              FROM documents WHERE doc_id < 150""")),

    // RTF text extraction: the q_doc_extract construction for the
    // third legacy format — each document rendered into a spec-valid
    // RTF (graft.sources.Rtf.buildRtf: font/color/info tables and a
    // starred unknown destination that must all be skipped, a field
    // whose instruction drops and result keeps), with non-ASCII
    // planted so BOTH escape shapes are on the hot path (\'hh
    // codepage bytes on odd ids, \uN with uc fallback on even — the
    // appended suffix carries é, cp1252-able, and №, which is not).
    // Same ANALYTIC oracle family
    Q("q_rtf_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val rtf = graft.sources.Rtf.buildRtf(src,
            txt + " résumé №" + id, hexEscapes = id % 2 == 1)
          (id, graft.sources.Rtf.extractText(rtf))
        }.toDF("doc_id", "extracted")
      },
      Some("""SELECT doc_id, source || chr(10) || text ||
                ' résumé №' || doc_id AS extracted
              FROM documents WHERE doc_id < 150""")),

    // Email/mbox extraction: each document becomes one full-shape
    // message in an mbox archive (graft.sources.Mime.buildMbox —
    // multipart/mixed over multipart/alternative, quoted-printable
    // cp1252 text part, base64 UTF-8 html part, an attachment leaf,
    // RFC 2047 B-encoded subject), split on RFC 4155 envelopes and
    // parsed back. The planted suffixes force the QP (€ is a cp1252
    // byte) and encoded-word (№ is not cp1252-able) decode paths —
    // a parser that skips either mangles the analytic oracle's
    // expected text
    Q("q_mbox_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val mbox = graft.sources.Mime.buildMbox(Seq(
            (s"$src@corpus.test", s"$src Grüße №$id",
              txt + " café 3€")))
          val msg = graft.sources.Mime.parseMessage(
            graft.sources.Mime.splitMbox(
              new String(mbox, "ISO-8859-1")).head)
          (id, msg.subject, msg.text)
        }.toDF("doc_id", "subject", "extracted")
      },
      Some("""SELECT doc_id, source || ' Grüße №' || doc_id AS subject,
                text || ' café 3€' AS extracted
              FROM documents WHERE doc_id < 150""")),

    // Subtitle parsing (SRT/WebVTT): each document's words become
    // 5-word cues with deterministic timestamps, rendered as SRT on
    // even ids and WebVTT (with NOTE blocks, cue identifiers,
    // settings, and inline markup the parser must strip) on odd, then
    // parsed back and re-aggregated. The oracle recomputes the cue
    // count / total duration / rejoined text analytically from the
    // word count, so timestamp math, cue splitting, and markup
    // stripping are each on the hook
    Q("q_subtitle_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
        docs.map { case (id, txt) =>
          val words = txt.split(" ")
          val cueTexts = words.grouped(5).map(_.mkString(" ")).toSeq
          val cues = cueTexts.zipWithIndex.map { case (t, i) =>
            (i * 2000L, i * 2000L + 1500L, t)
          }
          val content =
            if (id % 2 == 0) graft.sources.Subtitles.buildSrt(cues)
            else graft.sources.Subtitles.buildVtt(cues)
          val parsed = graft.sources.Subtitles.parse(content)
          (id, parsed.length.toLong,
            parsed.map(c => c.endMs - c.startMs).sum,
            parsed.map(_.text).mkString(" "))
        }.toDF("doc_id", "n_cues", "total_ms", "joined")
      },
      Some("""SELECT doc_id,
                CAST(ceil(len(string_split(text, ' ')) / 5.0) AS BIGINT)
                  AS n_cues,
                CAST(1500 * ceil(len(string_split(text, ' ')) / 5.0)
                  AS BIGINT) AS total_ms,
                text AS joined
              FROM documents WHERE doc_id < 150""")),

    // EPUB extraction: each document becomes a two-chapter book
    // (graft.sources.Epub.buildEpub — OCF container + OPF whose SPINE
    // order is deliberately the REVERSE of the ZIP entry order, a css
    // manifest item outside the spine, an in-body script, and
    // DTD-less named entities), extracted back through the container
    // walk + spine-ordered XHTML text. The oracle writes the expected
    // text analytically INCLUDING the fixture's entity-bearing line
    // (chr(160)/chr(8212) — a parser that drops or mis-maps entities,
    // leaks head/css/script content, or reads chapters in ZIP order
    // hash-mismatches)
    Q("q_epub_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val epub = graft.sources.Epub.buildEpub(src, txt)
          (id, graft.sources.Epub.extractText(epub))
        }.toDF("doc_id", "extracted")
      },
      Some("""SELECT doc_id, source || chr(10) || 'one' || chr(160) ||
                'space and a dash' || chr(8212) || 'here' || chr(10) ||
                'Chapter Two' || chr(10) || text AS extracted
              FROM documents WHERE doc_id < 150""")),

    // Markdown extraction: each document is rendered into CommonMark-
    // core markdown (header from source; body words cycled through
    // bold/italic/inline-code/link wrappers by position) and run
    // through the codegen'd extractMarkdownText chain. ANALYTIC
    // oracle: the wrappers must all unwrap back to exactly the
    // original words — a chain that eats markers, link targets, or
    // word text hash-mismatches
    Q("q_markdown_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        val md = docs.map { case (id, src, txt) =>
          val body = txt.split(" ").zipWithIndex.map { case (w, i) =>
            if (i % 13 == 3) s"[$w](http://x.test/$i)"
            else if (i % 11 == 2) s"`$w`"
            else if (i % 7 == 1) s"**$w**"
            else if (i % 5 == 1) s"*$w*"
            else w
          }.mkString(" ")
          (id, s"# $src\n\n$body")
        }.toDF("doc_id", "md")
        md.select(col("doc_id"),
          graft.functions.TextAnalysis
            .extractMarkdownText(col("md")).as("extracted"))
      },
      Some("""SELECT doc_id, source || chr(10) || text AS extracted
              FROM documents WHERE doc_id < 150""")),

    // ZIP shard ingestion: each document becomes a two-text-member
    // shard (plus a planted binary member that must be SKIP-COUNTED,
    // never decoded into the corpus), read back through the member
    // walk + BOM-aware decode. The oracle pins member count, skip
    // count, and the joined text analytically
    Q("q_zip_text_ingest",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val shard = graft.sources.Zip.buildShard(Seq(
            ("title.txt", src), ("body.txt", txt)))
          val (members, skipped) = graft.sources.Zip.textMembers(shard)
          (id, members.length.toLong, skipped.toLong,
            members.map(_._2).mkString("\n"))
        }.toDF("doc_id", "n_members", "n_skipped", "joined")
      },
      Some("""SELECT doc_id, CAST(2 AS BIGINT) AS n_members,
                CAST(1 AS BIGINT) AS n_skipped,
                source || chr(10) || text AS joined
              FROM documents WHERE doc_id < 150""")),

    // TAR shard ingestion: the zip gate's construction for tarballs —
    // each document becomes a ustar shard whose first member routes
    // through a GNU long-name pseudo-entry, plus a prefix-split deep
    // path member and a binary member that must skip-count; gzipped
    // whole-stream on odd ids. Oracle pins member/skip counts and the
    // joined text (the fixture's fixed deep-path member included)
    Q("q_tar_text_ingest",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val shard = graft.sources.Tar.buildShard(Seq(
            ("title.txt", src), ("body.txt", txt)),
            gzipped = id % 2 == 1)
          val (members, skipped) = graft.sources.Tar.textMembers(shard)
          (id, members.length.toLong, skipped.toLong,
            members.map(_._2).mkString("\n"))
        }.toDF("doc_id", "n_members", "n_skipped", "joined")
      },
      Some(tarIngestOracle))
  )
}
