package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * ZIP shard ingestion — corpora routinely arrive as directories of
 * `.zip` shards whose members are the actual `.txt`/`.jsonl`/`.md`
 * documents (academic dumps and scrape hand-offs ship this way).
 * JDK-only (`java.util.zip`), riding Spark's `binaryFile` source —
 * one task per shard, the [[Manifest]]/[[Warc.responses]] geometry
 * (ZIP central directories aren't split-readable without an external
 * index; a 100 TB corpus is many shards, and shard-level parallelism
 * is the right grain).
 *
 * Members explode to `(path, member, text)` rows decoded by
 * [[Html.decodeHtmlBytes]]'s BOM-aware sniff head (BOM wins, UTF-8
 * default — text members carry no meta/transport declarations).
 * Member reads are bomb-capped per entry AND per shard (the
 * [[Epub]] rule: per-entry caps alone allow N·cap in sum); a corrupt
 * shard quarantines per-FILE with the named error instead of failing
 * the job. Non-text members (by extension) are skipped with a
 * counted row, not silently: the ingest accounting must add up.
 *
 * The reference engine (parquery) reads parquet only — this is a
 * training-data-pipeline extension (SURVEY §8).
 */
object Zip {

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"ZIP: $msg")

  private val TextExtensions =
    Set("txt", "text", "jsonl", "json", "md", "csv", "tsv")

  private def extOf(name: String): String =
    name.lastIndexOf('.') match {
      case -1 => ""
      case i => name.substring(i + 1).toLowerCase
    }

  /** Explode one shard's text members: (member, text) plus a count of
    * skipped non-text members. */
  private[graft] def textMembers(bytes: Array[Byte])
      : (Seq[(String, String)], Int) = {
    if (bytes.length < 4 || !(bytes(0) == 'P' && bytes(1) == 'K'))
      err("not a ZIP shard")
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var skipped = 0
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          if (TextExtensions.contains(extOf(e.getName))) {
            val bos = new java.io.ByteArrayOutputStream(
              math.min(math.max(64, e.getSize.toInt), 1 << 20))
            val chunk = new Array[Byte](8192)
            var n = zin.read(chunk)
            while (n >= 0) {
              total += n
              if (bos.size().toLong + n > Pdf.MaxDecodedBytes ||
                  total > Pdf.MaxDecodedBytes)
                err(s"${e.getName} pushes the shard past " +
                  s"${Pdf.MaxDecodedBytes} decoded bytes " +
                  "(decompression bomb?)")
              bos.write(chunk, 0, n)
              n = zin.read(chunk)
            }
            out += e.getName -> Html.decodeHtmlBytes(bos.toByteArray)
          } else skipped += 1
        }
        e = zin.getNextEntry
      }
    } catch {
      case ex: java.util.zip.ZipException => err(s"bad ZIP: ${ex.getMessage}")
    } finally zin.close()
    // ZipInputStream returns NO entries (rather than throwing) on a
    // payload whose PK prefix is a lie — and an entry-less shard in a
    // corpus hand-off is anomalous either way: err named, don't
    // silently contribute zero documents
    if (out.isEmpty && skipped == 0)
      err("no ZIP entries (truncated or corrupt shard?)")
    (out.toSeq, skipped)
  }

  /**
   * Spark surface: every text member of every shard under `pathGlob`
   * as `(path, member, text, skipped_members, zip_error)` — one task
   * per shard, corrupt shards quarantined per-FILE.
   */
  def textShards(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        try {
          val (members, skipped) = textMembers(bytes)
          if (members.isEmpty)
            Seq((path, null: String, null: String, skipped, null: String))
          else members.map { case (m, t) =>
            (path, m, t, skipped, null: String)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Seq((path, null: String, null: String, 0,
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
        }
      }
      .toDF("path", "member", "text", "skipped_members", "zip_error")
  }

  /** Fixture shard: named text members (+ one binary member that must
    * be skip-counted, never decoded into the corpus). */
  def buildShard(members: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    members.foreach { case (name, text) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(text.getBytes("UTF-8")); z.closeEntry()
    }
    z.putNextEntry(new java.util.zip.ZipEntry("image.bin"))
    z.write(Array[Byte](0, 1, 2, 3)); z.closeEntry()
    z.close()
    out.toByteArray
  }
}
