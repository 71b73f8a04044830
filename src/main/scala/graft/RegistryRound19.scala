package graft

import org.apache.spark.sql.functions._

import SparkEntry._

/** Round-19 extensions: MediaWiki dump ingestion + wikitext
  * extraction (the highest-hit-rate pretraining corpus format), zstd
  * auto-sniff for the binary shard families (`.tar.zst` /
  * `.warc.zst` — RedPajama-class hand-offs), and office spreadsheet/
  * slide text extraction. Each gate shares an existing family's
  * analytic oracle construction. */
private[graft] object RegistryRound19 {

  private[graft] val entries: Seq[Q] = Seq(

    // Wikitext extraction, end-to-end through the dump layer: each
    // document renders into export-format page XML
    // (graft.sources.Wiki.buildPage — an independent writer whose
    // XML escaping the StAX parse must invert), parses back
    // (XXE-off), and its wikitext — body words cycled through
    // link/bold/italic/template wrappers by position, plus a
    // heading, comment, table, <ref>, external link, File/Category
    // links, and both named and numeric entities — extracts through
    // the full strip chain. ANALYTIC oracle: every wrapper must
    // unwrap to exactly the original words and the planted entity
    // suffix must decode, so a chain that eats markers, leaks
    // template/table/citation noise, or mis-decodes entities
    // hash-mismatches
    Q("q_wikitext_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val body = txt.split(" ").zipWithIndex.map { case (w, i) =>
            if (i % 13 == 3) s"[[Target $i|$w]]"
            else if (i % 11 == 2) s"'''$w'''"
            else if (i % 7 == 1) s"''$w''"
            else if (i % 5 == 1) s"{{fmt|$i}}$w"
            else w
          }.mkString(" ")
          val wikitext =
            s"== $src ==\n<!-- build $id -->\n" +
              "{| class=\"wikitable\"\n|-\n| dropped || cell\n|}\n" +
              body + s"<ref>cite $id</ref> [http://ext.test/$id " +
              "ext-label] M&uuml;ller &amp; S&oslash;n &#8212; fin\n" +
              s"[[File:p$id.png|thumb|cap [[X|y]]]]\n[[Category:Fix]]\n"
          val page = graft.sources.Wiki.parsePage(
            graft.sources.Wiki.buildPage(s"Doc $id", 0, wikitext))
          (id, graft.sources.Wiki.extractWikitext(page.text))
        }.toDF("doc_id", "extracted")
      },
      Some("""SELECT doc_id, source || chr(10) || text ||
                ' ext-label Müller & Søn — fin' AS extracted
              FROM documents WHERE doc_id < 150""")),

    // .tar.zst shard ingestion: the q_tar_text_ingest construction
    // with the whole-stream zstd wrap in place of gzip — same
    // members, same walk, same ORACLE LITERAL (shared verbatim, so
    // the two gates can never silently drift apart); what changes is
    // only the magic-sniffed decompressor (Zstd.sniffWrap, pure-Java
    // airlift stream already on the classpath)
    Q("q_tar_text_ingest_zst",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val shard = graft.sources.Zstd.compress(
            graft.sources.Tar.buildShard(Seq(
              ("title.txt", src), ("body.txt", txt))))
          val (members, skipped) = graft.sources.Tar.textMembers(shard)
          (id, members.length.toLong, skipped.toLong,
            members.map(_._2).mkString("\n"))
        }.toDF("doc_id", "n_members", "n_skipped", "joined")
      },
      Some(RegistryRound18.tarIngestOracle)),

    // XLSX extraction: each document becomes a two-sheet workbook
    // (graft.sources.Xlsx.buildXlsx — worksheet PARTS stored in the
    // ZIP in reverse, so only workbook order yields the right sheet
    // sequence; body words alternate sharedStrings / inline-string
    // cells, with rich-run <r> splits on odd shared indexes, plus a
    // number, a boolean, and a formula-result cell). ANALYTIC
    // oracle: sheet names, the tab-joined cells, and every cell-type
    // resolution are all recomputed from the source columns
    Q("q_xlsx_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          import graft.sources.Xlsx
          val bodyCells = txt.split(" ").zipWithIndex.map {
            case (w, i) => Xlsx.Cell(w, if (i % 2 == 0) 's' else 'i')
          }.toSeq ++ Seq(Xlsx.Cell("42.5", 'n'),
            Xlsx.Cell("TRUE", 'b'), Xlsx.Cell(s"f$id", 'f'))
          val wb = Xlsx.buildXlsx(Seq(
            ("Meta", Seq(Seq(Xlsx.Cell(src, 's'),
              Xlsx.Cell(id.toString, 'n')))),
            ("Body", Seq(bodyCells))))
          (id, Xlsx.extractText(wb))
        }.toDF("doc_id", "extracted")
      },
      Some("""SELECT doc_id, 'Meta' || chr(10) || source || chr(9) ||
                doc_id || chr(10) || 'Body' || chr(10) ||
                replace(text, ' ', chr(9)) || chr(9) || '42.5' ||
                chr(9) || 'TRUE' || chr(9) || 'f' || doc_id
                AS extracted
              FROM documents WHERE doc_id < 150""")),

    // PPTX extraction: each document becomes a two-slide deck
    // (graft.sources.Pptx.buildPptx — slide parts stored in the ZIP
    // reversed, so only sldIdLst order yields the right deck;
    // slide 2 carries two paragraphs). ANALYTIC oracle: title slide,
    // body paragraphs, and deck order recomputed from the source
    // columns
    Q("q_pptx_extract",
      (s, d) => {
        import s.implicits._
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 150)
          .select(col("doc_id"), col("source"), col("text"))
          .as[(Long, String, String)]
        docs.map { case (id, src, txt) =>
          val deck = graft.sources.Pptx.buildPptx(Seq(
            Seq(src), Seq(txt, s"deck $id")))
          (id, graft.sources.Pptx.extractText(deck))
        }.toDF("doc_id", "extracted")
      },
      Some("""SELECT doc_id, source || chr(10) || text || chr(10) ||
                'deck ' || doc_id AS extracted
              FROM documents WHERE doc_id < 150"""))
  )
}
