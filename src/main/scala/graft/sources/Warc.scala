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
 *  - [[readWetRecords]]: FILE layer — `spark.read.text` with the WARC
 *    version line as a custom record delimiter. Hadoop's line reader
 *    handles delimiters straddling split boundaries, so a 1 GiB WET
 *    file fans out across tasks with no pre-splitting pass — the
 *    100 TB-correct shape (record-at-split-boundary is the classic
 *    hand-rolled-reader bug).
 *  - [[parseWet]] / [[wetFields]]: COLUMN layer — pure codegen'd
 *    regexp extraction of the header fields + payload from one record
 *    string; RE2-portable (non-greedy dot, no lookahead), so the
 *    driver's DuckDB oracle replays it verbatim (`q_wet_parse`).
 *
 * Records that lack a parseable header block yield null fields rather
 * than failing the scan — crawl archives contain truncated/corrupt
 * records and an ingest must skim past them (filter on
 * `url IS NOT NULL`).
 */
object Warc {

  /** The WARC record boundary: a version line at record start. WET
    * files in the wild are `WARC/1.0`; pass the version your archive
    * declares. */
  val RecordDelimiter = "WARC/1.0\r\n"

  /**
   * Raw WET records from `path` (file, directory, or glob): one row
   * per record, version line stripped, column `record`. Empty
   * prefixes (the bytes before the first version line — normally
   * none) are dropped. Uses the text source's `lineSep`, so records
   * split correctly across Hadoop input splits and the scan
   * parallelizes by byte range like any text read.
   */
  def readWetRecords(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", RecordDelimiter).text(path)
      .select(col("value").as("record"))
      .where(length(trim(col("record"))) > 0)

  /** Header block of a record (everything before the first blank
    * line), non-greedy so a blank line inside the payload cannot
    * extend it. */
  private def headerBlock(rec: Column): Column =
    regexp_extract(rec, "(?s)^(.*?)\\r?\\n\\r?\\n", 1)

  /** One named WARC header value out of a record's header block
    * (case-exact per the WARC spec's canonical spelling; values run
    * to end-of-line). Empty string when absent. */
  def wetHeader(rec: Column, name: String): Column =
    regexp_extract(headerBlock(rec), name + ":\\s*([^\\r\\n]*)", 1)

  /** Payload of a record: everything after the first blank line,
    * trailing record-separator newlines trimmed. */
  def wetPayload(rec: Column): Column =
    regexp_replace(
      regexp_extract(rec, "(?s)\\r?\\n\\r?\\n(.*)$", 1),
      "[\\r\\n]+$", "")

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
  def wetDocuments(spark: SparkSession, path: String): DataFrame =
    parseWet(readWetRecords(spark, path))

  /** Streaming twin of [[readWetRecords]]: WET archives landing in
    * `dir` become micro-batches of records — the crawl-drop ingestion
    * shape (each new Common Crawl segment file is picked up once,
    * tracked by the stream's file index). */
  def wetRecordStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.option("lineSep", RecordDelimiter).text(dir)
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
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.IngestPipeline.dedupIngest(
      parseWet(wetRecordStream(spark, wetDir))
        .where(col("url").isNotNull),
      "url", "text", corpusDir, checkpointDir, trigger)

  /** Render rows as WET `conversion` records (the inverse of
    * [[parseWet]] — fixture/export helper; payload length is measured
    * in characters to mirror the parse side's `length`). */
  def toWetRecord(url: Column, date: Column, text: Column): Column =
    concat(
      lit("WARC-Type: conversion\r\nWARC-Target-URI: "), url,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), length(text),
      lit("\r\n\r\n"), text, lit("\r\n\r\n"))
}
