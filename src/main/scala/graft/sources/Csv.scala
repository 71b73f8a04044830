package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * CSV source/sink with the contracts pinned for hostile real-world
 * data — the other edge format training pipelines can't refuse
 * (spreadsheet exports, labeling-vendor deliveries, eval result
 * sheets). Spark-first: the built-in csv reader/writer does the
 * parsing (Univocity under the hood); this wrapper pins the choices
 * the defaults get wrong for a corpus whose text columns contain the
 * whole CSV metacharacter set:
 *
 *  - RFC 4180 dialect, not Spark's legacy backslash dialect: quotes
 *    are escaped by DOUBLING (`""`) — `escape` is set to the quote
 *    char on BOTH sides so what [[write]] emits is what Excel,
 *    DuckDB, pandas and [[read]] itself parse back.
 *  - Embedded newlines survive: text columns hold real `\n`/`\r\n`;
 *    [[read]] always sets `multiLine` so a quoted field spanning
 *    lines is one row, never two corrupt ones. (Cost, stated: a
 *    multiLine CSV file is NOT line-splittable, so parallelism is
 *    per-FILE — [[write]] takes `maxRecordsPerFile` to keep shards
 *    small enough that file-granularity still saturates a cluster.)
 *  - EXPLICIT schema, never inference (inference is a second full
 *    scan whose result drifts with the sample), and corrupt rows
 *    QUARANTINED into [[CorruptCol]] under PERMISSIVE mode — same
 *    accounting contract as [[Jsonl]]: a malformed row surfaces with
 *    its raw text, never a failed scan, never a silent drop.
 *
 * Extension beyond the reference surface — the reference is
 * parquet-only (`parquery/README.md`). Scale shape: no shuffle on
 * either path; read parallelism is per-file (see above), write is a
 * narrow per-partition stream.
 */
object Csv {

  /** Where a malformed row's raw text lands (Spark's conventional
    * name). */
  val CorruptCol = "_corrupt_record"

  /** The pinned dialect, shared by both directions: header row,
    * double-quote quoting, quotes escaped by DOUBLING, and nulls as
    * the `\N` token (the MySQL-dump convention). `\N` is what makes
    * the null/"" distinction SURVIVE the trip — with the default
    * (nullValue = empty string), a quoted empty field parses to ""
    * and then the post-parse null comparison folds it to null, the
    * classic CSV data-loss pitfall. With `\N`: null → `\N` → null,
    * and "" → `""` → "". Residual corner, stated: a string field
    * whose entire value is literally `\N` reads back null — the
    * convention's known cost, pinned by CsvSpec. */
  private val dialect = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"", // RFC 4180: "" inside a quoted field
    "nullValue" -> "\\N",
    // RFC 4180 treats spaces as field content; Spark's WRITER trims
    // both edges by default and would corrupt whitespace-significant
    // text silently
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false",
    // when quote == escape, the escape-the-escape char DEFAULTS to
    // \u0000 — a data NUL right after an escaped quote then gets
    // swallowed by the reader (found by CsvSpec's round-trip
    // property). Pin it to U+FFFF, a Unicode NONCHARACTER that never
    // appears in interchange-valid text, which disables the collision
    // for every real corpus
    "charToEscapeQuoteEscaping" -> "￿")

  /** Stable rendering of the pinned dialect — cache-key material for
    * fixtures whose BYTES depend on the writer configuration. */
  def dialectKey: String =
    dialect.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")

  /** Write `df` as RFC 4180 CSV shards with a header row.
    * `maxRecordsPerFile` matters more here than for parquet/JSONL:
    * multiLine readers parallelize per file. */
  def write(df: DataFrame, path: String,
            maxRecordsPerFile: Long = 0L,
            compression: String = "none"): Unit = {
    val w = df.write.mode("overwrite").options(dialect)
      .option("compression", compression)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).csv(path)
  }

  /** Read CSV under an EXPLICIT schema with [[CorruptCol]] (string,
    * null for clean rows) appended: a row whose value does not fit
    * the declared TYPE surfaces with its raw text there. Unlike the
    * json case, the csv source reads the corrupt column natively, so
    * this IS the file source (no text+from_csv detour) — the corrupt
    * column just has to be part of the declared read schema, which
    * [[read]] appends here.
    *
    * Quarantine scope, stated plainly (Spark 4 csv semantics, pinned
    * by CsvSpec): type-conversion failures and token-count drift
    * both quarantine — but detection is RELATIVE TO THE REFERENCED
    * COLUMNS, because the parser only converts the columns the plan
    * touches (a bad value, or a missing trailing token, in an
    * unreferenced column never surfaces). Completeness-critical
    * accounting must reference the full width — [[quarantineStats]]
    * does. */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"declared schema must not contain $CorruptCol (it is appended)")
    spark.read.options(dialect)
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, StringType))
      .csv(path)
  }

  /** Streaming CSV ingestion — the `readStream` twin of [[read]] with
    * the SAME dialect and quarantine contract (a corrupt row in a
    * drop must not kill the stream, and must stay accountable).
    * File-source semantics (new files per micro-batch) come from
    * Spark's csv stream; the multiLine caveat applies doubly here —
    * keep dropped shards small, they parse per-file. */
  def readStream(spark: SparkSession, path: String,
                 schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"declared schema must not contain $CorruptCol (it is appended)")
    spark.readStream.options(dialect)
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, StringType))
      .csv(path)
  }

  /** Valid rows only, quarantine dropped — the ingestion happy path.
    * Caveat (see [[quarantineStats]]): "valid" is judged against the
    * columns the downstream plan references; keep the full row
    * width through the filter when completeness matters. */
  def readClean(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    read(spark, path, schema)
      .where(col(CorruptCol).isNull).drop(CorruptCol)

  /** One-row accounting frame `(n_valid, n_corrupt)`. The valid
    * count anchors EVERY data column in its expression, which is
    * load-bearing twice over: (a) Spark rejects csv plans whose
    * referenced columns are ONLY the corrupt column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN); (b) the csv parser only
    * CONVERTS referenced columns, so a type error in an unreferenced
    * column never populates the corrupt record — quarantine
    * accounting is only complete under the full schema. The same
    * caveat applies to any projection over [[read]]/[[readClean]]:
    * corrupt detection is relative to the columns the plan touches. */
  def quarantineStats(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    read(spark, path, schema)
      .agg(count(when(col(CorruptCol).isNull,
        concat_ws("",
          schema.fieldNames.toIndexedSeq.map(f =>
            col(s"`$f`").cast(StringType)): _*)))
        .as("n_valid"),
        count(col(CorruptCol)).as("n_corrupt"))
}
