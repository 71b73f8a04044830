package graft

import org.apache.spark.sql.functions._

import SparkEntry._

/** Round-18 extensions: legacy `.doc` (Word 97 binary) text
  * extraction — closing the document-format family over the format
  * pre-2007 dumps actually carry — and raw-bytes charset sniffing
  * for crawled HTML. Each gate shares an existing family's analytic
  * oracle construction. */
private[graft] object RegistryRound18 {

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
              FROM documents WHERE doc_id < 150"""))
  )
}
