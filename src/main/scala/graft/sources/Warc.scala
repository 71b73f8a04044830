package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC/WET ingestion — the format web crawls actually arrive in
 * (ISO 28500, public; Common Crawl ships text extracts as WET, a WARC
 * profile whose `conversion` records carry plain-text payloads).
 * Extension beyond the reference surface (parquet-only,
 * `parquery/aggregate_pq.py`): a crawl pipeline's FIRST step is
 * WET → typed rows, and doing it inside the engine keeps the
 * record-splitting distributed instead of a preprocessing fleet.
 *
 * Two layers, so the parse logic is driver-gate testable:
 *  - [[readWetRecords]]: FILE layer — `spark.read.text` with the
 *    record SEPARATOR (blank line + version line, e.g.
 *    `\r\n\r\nWARC/1.0\r\n`) as a custom delimiter. Hadoop's line
 *    reader handles delimiters straddling input splits, so a 1 GiB
 *    WET file fans out across tasks with no pre-splitting pass — the
 *    100 TB-correct shape (record-at-split-boundary is the classic
 *    hand-rolled-reader bug). The WARC version is a parameter
 *    (`WARC/1.0` default; pass `WARC/1.1` for ISO 28500:2017
 *    archives — a wrong version would otherwise collapse a whole
 *    file into one record).
 *  - [[parseWet]] / [[wetHeader]] / [[wetPayload]]: COLUMN layer —
 *    pure codegen'd regexp extraction of the header fields + payload
 *    from one record string.
 *
 * Records that lack a parseable header block yield null fields rather
 * than failing the scan — crawl archives contain truncated/corrupt
 * records and an ingest must skim past them (filter on
 * `url IS NOT NULL`).
 *
 * Documented boundary of delimiter-scan splitting: a payload that
 * itself contains a blank line immediately followed by a version
 * line (i.e. quotes a WARC file verbatim) still splits there — the
 * spurious fragment parses to null fields and is dropped, but the
 * quoting record's text is truncated at the quote. Strict
 * `Content-Length` framing cannot false-split but cannot byte-range
 * parallelize either (records must be walked sequentially from the
 * file head); this reader takes the distributed side of that trade,
 * as splittable-WARC readers generally do.
 */
object Warc {

  /** Record separator inside an archive: the record terminator (blank
    * line) followed by the next record's version line. Requiring the
    * preceding blank line keeps a bare in-payload `WARC/1.0` LINE
    * from splitting a record (only a full blank-line + version
    * sequence can — see the object scaladoc). */
  def recordSeparator(version: String): String =
    "\r\n\r\n" + version + "\r\n"

  /**
   * Raw WET records from `path` (file, directory, or glob): one row
   * per record in column `record`, each carrying its version line
   * (the first record keeps its own; later ones get the separator's
   * consumed copy conceptually — parsing never depends on it).
   * Whitespace-only fragments are dropped. Uses the text source's
   * `lineSep`, so records split correctly across Hadoop input splits
   * and the scan parallelizes by byte range like any text read.
   */
  def readWetRecords(spark: SparkSession, path: String,
                     version: String = "WARC/1.0"): DataFrame =
    spark.read.option("lineSep", recordSeparator(version)).text(path)
      .select(col("value").as("record"))
      .where(length(trim(col("record"))) > 0)

  /** Header block of a record (everything before the first blank
    * line), non-greedy so a blank line inside the payload cannot
    * extend it. */
  private def headerBlock(rec: Column): Column =
    regexp_extract(rec, "(?s)^(.*?)\\r?\\n\\r?\\n", 1)

  /** One named WARC header value out of a record's header block
    * (case-exact per the WARC spec's canonical spelling; values run
    * to end-of-line). Anchored to line START, so a hostile header
    * VALUE containing another header's name (e.g. a URI with
    * `Content-Length:` in its query string) cannot win the
    * extraction. Empty string when absent. */
  def wetHeader(rec: Column, name: String): Column =
    regexp_extract(headerBlock(rec),
      "(?m)^" + name + ":\\s*([^\\r\\n]*)", 1)

  /** Payload of a record: everything after the first blank line, with
    * exactly ONE trailing blank-line record terminator stripped when
    * present (the file's last record keeps its terminator; earlier
    * records lost theirs to the separator). Content newlines are
    * PRESERVED — stripping all trailing newlines would silently alter
    * document bytes ahead of exact-dedup hashing. */
  def wetPayload(rec: Column): Column =
    regexp_replace(
      regexp_extract(rec, "(?s)\\r?\\n\\r?\\n(.*)$", 1),
      // \z (absolute end), NOT $: Java's default-mode $ also matches
      // BEFORE a final line terminator, which would let the strip eat
      // a genuine content newline ahead of the terminator
      "\\r?\\n\\r?\\n\\z", "")

  /**
   * Typed fields from one WET `conversion` record:
   * `(url, warc_date, content_length, text)`. Missing headers give
   * empty strings / null length — filter, don't throw, on corrupt
   * records. All codegen'd regexp projections, zero shuffle.
   */
  def parseWet(records: DataFrame,
               recordCol: String = "record"): DataFrame = {
    val rec = col(recordCol)
    records.select(
      nullif(wetHeader(rec, "WARC-Target-URI"), lit("")).as("url"),
      nullif(wetHeader(rec, "WARC-Date"), lit("")).as("warc_date"),
      nullif(wetHeader(rec, "Content-Length"), lit(""))
        .cast("long").as("content_length"),
      wetPayload(rec).as("text"))
  }

  /** File path → parsed WET documents in one call: the ingestion
    * entry point (`readWetRecords` ∘ `parseWet`), corrupt records
    * surfaced as null-url rows. */
  def wetDocuments(spark: SparkSession, path: String,
                   version: String = "WARC/1.0"): DataFrame =
    parseWet(readWetRecords(spark, path, version))

  /** Streaming twin of [[readWetRecords]]: WET archives landing in
    * `dir` become micro-batches of records — the crawl-drop ingestion
    * shape (each new Common Crawl segment file is picked up once,
    * tracked by the stream's file index). */
  def wetRecordStream(spark: SparkSession, dir: String,
                      version: String = "WARC/1.0"): DataFrame =
    spark.readStream.option("lineSep", recordSeparator(version))
      .text(dir)
      .select(col("value").as("record"))
      .where(length(trim(col("record"))) > 0)

  /**
   * End-to-end streaming crawl ingestion: WET archives → parsed docs
   * (corrupt records dropped) → exact-dedup append into `corpusDir`,
   * composed from [[parseWet]] and [[graft.streaming.IngestPipeline
   * .dedupIngest]] — the URL is the document id, so re-crawled
   * identical pages and replayed micro-batches both dedup away
   * (idempotent by the ingest pipeline's contract). Swap in
   * `nearDupIngest` for the Bloom + banded-MinHash admission when
   * near-copies must be rejected too — same composition.
   */
  def wetIngest(spark: SparkSession, wetDir: String, corpusDir: String,
                checkpointDir: String,
                version: String = "WARC/1.0",
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.IngestPipeline.dedupIngest(
      parseWet(wetRecordStream(spark, wetDir, version))
        .where(col("url").isNotNull),
      "url", "text", corpusDir, checkpointDir, trigger)

  /** Render rows as spec-shaped WET `conversion` records — version
    * line included, `Content-Length` in OCTETS (the WARC spec's unit;
    * a character count would mis-frame any conformant reader on
    * multi-byte text), blank-line terminator appended, so
    * concatenated outputs form a valid archive that [[readWetRecords]]
    * splits back apart (the round trip WarcSpec pins). */
  def toWetRecord(url: Column, date: Column, text: Column,
                  version: String = "WARC/1.0"): Column =
    concat(
      lit(version + "\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
      url,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), octet_length(text),
      lit("\r\n\r\n"), text, lit("\r\n\r\n"))
}
