package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * JSON Lines source/sink — the de-facto LLM training-data interchange
 * format (one JSON object per line; what tokenizer trainers, eval
 * harnesses and data vendors actually ship). Spark-first: the built-in
 * json reader/writer IS JSONL, so this wrapper adds no parser — it
 * pins the two contracts a 100 TB pipeline needs and the defaults get
 * wrong:
 *
 *  - EXPLICIT schema, never inference: schema inference is a second
 *    full scan of the corpus before the real one, and its result
 *    drifts with the sample it sees. [[read]] requires the schema.
 *  - Corrupt lines QUARANTINED, never a failed scan and never a
 *    silent drop: vendor JSONL is hostile (truncated lines, wrong
 *    types, stray BOMs). PERMISSIVE mode with a declared corrupt
 *    column keeps the malformed line's raw text in
 *    [[CorruptCol]] — both the per-row accounting ("how much of this
 *    drop was garbage") and the repair loop ("show me the garbage")
 *    fall out as plain filters.
 *
 * Extension beyond the reference surface — the reference is
 * parquet-only (`parquery/README.md`); training pipelines ingest and
 * emit JSONL at their edges. Scale shape: read and write are both
 * narrow per-file streams (JSONL splits by line like any text
 * format); no shuffle anywhere.
 */
object Jsonl {

  /** Where a malformed line's raw text lands (Spark's conventional
    * name for it). */
  val CorruptCol = "_corrupt_record"

  /** Write `df` as JSONL shards (Spark's json sink writes one object
    * per line). `maxRecordsPerFile` bounds shard size for downstream
    * consumers that stream whole files; `compression` is any Spark
    * codec name (`gzip`, `zstd`, `none`). */
  def write(df: DataFrame, path: String,
            maxRecordsPerFile: Long = 0L,
            compression: String = "none"): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).json(path)
  }

  /** The shared line-parse chain behind [[read]] and [[readStream]]:
    * input is a single-`value` text frame (by-name so the schema
    * contract check runs before the reader touches the path). */
  private def parsed(lines: => DataFrame, schema: StructType)
      : DataFrame = {
    // validate the contract BEFORE the reader touches the path (the
    // text source checks path existence eagerly)
    require(!schema.fieldNames.contains(CorruptCol),
      s"declared schema must not contain $CorruptCol (it is appended)")
    val withCorrupt = schema.add(CorruptCol, StringType)
    lines
      // whitespace-ONLY lines are skipped like the json source does
      // (Spark's trim strips spaces only — a tab-padded blank line
      // must not read as a corrupt record)
      .where(!col("value").rlike("^\\s*$"))
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("__j"),
        col("value"))
      // belt-and-braces: if the parser nulls the whole struct instead
      // of populating the corrupt field, the raw line still lands in
      // the quarantine column rather than vanishing
      .select((schema.fieldNames.map(f => col(s"__j.`$f`")) :+
        coalesce(col(s"__j.`$CorruptCol`"),
          when(col("__j").isNull, col("value")))
          .as(CorruptCol)): _*)
  }

  /** Read JSONL under an EXPLICIT schema, with [[CorruptCol]]
    * (string, null for clean rows) appended: a malformed line — bad
    * JSON or a value that does not fit the declared type — surfaces
    * as a row with its raw text there instead of failing the scan or
    * vanishing.
    *
    * Implementation note: this is `text` + `from_json`, NOT the json
    * file source — Spark rejects any plan over a raw json file whose
    * required columns are only the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    * exactly the shape of a quarantine audit. With the parse as a
    * computed column the corrupt text is an ordinary field: same
    * single narrow scan, same Jackson parser, no restriction. Blank
    * lines are skipped (the json source's behavior). */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame =
    parsed(spark.read.text(path), schema)

  /** Streaming JSONL ingestion — training-data drops land as JSONL
    * shards; this is the `readStream` twin of [[read]] with the SAME
    * quarantine contract (a corrupt line in a drop must not kill the
    * stream, and must stay accountable). Compose with
    * `streaming.IngestPipeline` for dedup-on-arrival. File-source
    * semantics (new files per micro-batch) come from Spark's text
    * stream; `maxFilesPerTrigger` etc. go on the session/reader conf. */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    parsed(spark.readStream.text(path), schema)

  /** Valid rows only, quarantine column dropped — the ingestion
    * happy path. */
  def readClean(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    read(spark, path, schema)
      .where(col(CorruptCol).isNull).drop(CorruptCol)

  /** One-row accounting frame `(n_valid, n_corrupt)` for an ingest. */
  def quarantineStats(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    read(spark, path, schema)
      .agg(count(when(col(CorruptCol).isNull, lit(1))).as("n_valid"),
        count(col(CorruptCol)).as("n_corrupt"))
}
