package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * CDXJ capture-index ingestion — the fourth leg of the Common Crawl
 * family ([[Warc]] raw, [[Wat]] metadata, WET text; the CDX index is
 * how you FETCH from the other three selectively). Each crawl ships
 * ~300 gzip index shards of line records
 *
 * {{{
 * com,example)/page 20260101123456 {"url":"…","mime":"…","status":
 *   "200","digest":"SHA1…","length":"1234","offset":"5678",
 *   "filename":"crawl-data/…/x.warc.gz"}
 * }}}
 *
 * (SURT key, 14-digit timestamp, JSON blob — the public pywb CDXJ
 * format). The 100 TB significance is the access pattern it unlocks:
 * instead of scanning every WARC shard, a pipeline joins its url/
 * digest selection against the index and fetches ONLY the matching
 * `(filename, offset, length)` byte ranges — the difference between
 * reading 100 TB and reading the 50 GB you actually want. This
 * module is that plan's builder:
 *
 *  - [[entries]]: index lines → typed capture rows. Pure codegen'd
 *    projections (one `split`, one schema'd `from_json`, `try_`
 *    casts — no UDF, no typed map); malformed lines quarantine
 *    per-ROW with `cdx_error` (named, counted — never dropped).
 *  - [[latestCaptures]]: the dedup policy view — one row per SURT
 *    key, newest capture wins (per-key window, keyed shuffle).
 *  - [[fetchPlan]]: selected captures → per-WARC-file fetch lists,
 *    offset-sorted (range coalescing is the fetcher's job; sorted
 *    input makes it a linear pass) with per-file row/byte totals for
 *    task sizing. One keyed shuffle on filename; the plan output is
 *    KB-per-file — the driver never sees record data.
 *
 * Scale shape: the gzip shards read one-task-per-file (the [[Warc]]
 * arithmetic: ~300 × ~1 GB per crawl); everything downstream is
 * keyed. The reference engine (parquery) reads parquet only — this
 * is a training-data-pipeline extension (SURVEY §8).
 */
object Cdx {

  /** The consumed subtree of the CDXJ blob — all strings in the wire
    * format (numbers arrive quoted); typing happens in [[entries]]
    * via try_cast so a stray "-" nulls instead of erroring the row. */
  private val BlobSchema = StructType(Seq(
    StructField("url", StringType), StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType)))

  /**
   * CDXJ lines under `pathGlob` as capture rows: `(surt, capture_ts,
   * url, mime, status, digest, length, offset, filename, cdx_error)`.
   * A line that is not `key ts {json}` (or whose timestamp/JSON is
   * malformed) yields nulls + the named `cdx_error`.
   */
  def entries(spark: SparkSession, pathGlob: String): DataFrame =
    parseLines(spark.read.textFile(pathGlob).toDF("value"))

  /** The parse core over any frame with a `value` line column —
    * [[entries]] is the file surface; streaming/test callers compose
    * this directly. */
  def parseLines(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), " ", 3)
    val j = from_json(parts.getItem(2), BlobSchema)
    lines
      .where(trim(col("value")) =!= "")
      .select(
        parts.getItem(0).as("surt"),
        try_to_timestamp(parts.getItem(1),
          lit("yyyyMMddHHmmss")).as("capture_ts"),
        j.as("j"))
      .select(col("surt"), col("capture_ts"),
        col("j.url").as("url"), col("j.mime").as("mime"),
        expr("try_cast(j.status AS INT)").as("status"),
        col("j.digest").as("digest"),
        expr("try_cast(j.length AS BIGINT)").as("length"),
        expr("try_cast(j.offset AS BIGINT)").as("offset"),
        col("j.filename").as("filename"),
        when(col("capture_ts").isNull,
          lit("CDX: malformed timestamp field"))
          .when(col("j").isNull || col("j.filename").isNull,
            lit("CDX: malformed JSON blob"))
          .otherwise(lit(null).cast(StringType)).as("cdx_error"))
  }

  /**
   * One row per SURT key — the newest capture (ties broken by
   * offset desc then filename, deterministic). Input is [[entries]]
   * output; error rows are excluded (they have no key to dedup on).
   */
  def latestCaptures(entries: DataFrame): DataFrame =
    entries
      .where(col("cdx_error").isNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("surt"))
          .orderBy(col("capture_ts").desc, col("offset").desc,
            col("filename"))))
      .where(col("__rn") === 1).drop("__rn")

  /**
   * Selected captures → the per-WARC-file fetch plan:
   * `(filename, n_records, total_bytes, ranges)` where `ranges` is
   * the offset-SORTED `array<struct<offset,length>>` — ready for a
   * linear coalescing fetcher. Documented boundary: rows without a
   * usable range (error rows, null offset/length) are excluded here;
   * a caller wanting the drop count takes it from [[entries]]
   * directly (`cdx_error IS NOT NULL OR offset IS NULL`) — the plan
   * builder does not hide a second accounting surface.
   */
  def fetchPlan(captures: DataFrame): DataFrame =
    captures
      .where(col("cdx_error").isNull && col("offset").isNotNull &&
        col("length").isNotNull)
      .groupBy(col("filename"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("length")).as("total_bytes"),
        sort_array(collect_list(struct(col("offset"), col("length"))))
          .as("ranges"))

  // ---------------------------------------------------------------
  // fixture writer
  // ---------------------------------------------------------------

  /** CDXJ lines for `(surt, ts14, url, status, digest, length,
    * offset, filename)` captures — JSON escaping via the shared
    * [[Wat.jsonEscape]]. */
  def buildCdx(rows: Seq[(String, String, String, Int, String, Long,
      Long, String)]): String =
    rows.map { case (surt, ts, url, status, digest, len, off, fn) =>
      s"""$surt $ts {"url":"${Wat.jsonEscape(url)}",""" +
        s""""mime":"text/html","status":"$status",""" +
        s""""digest":"${Wat.jsonEscape(digest)}","length":"$len",""" +
        s""""offset":"$off","filename":"${Wat.jsonEscape(fn)}"}"""
    }.mkString("", "\n", "\n")
}
