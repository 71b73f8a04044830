package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table layout for CO-LOCATED joins — the storage-level
 * answer to "this join shuffles both sides every single run". A
 * table written `CLUSTERED BY (key) INTO n BUCKETS` hash-partitions
 * its FILES by the key at write time; two tables bucketed the same
 * way join with ZERO exchange on either side (Spark's bucketed scan
 * reports the join key's hash partitioning, so EnsureRequirements
 * inserts no shuffle — BucketedSpec pins the exchange-free plan). At
 * 100 TB this converts the recurring fact-to-fact join (lineitem ⋈
 * orders, corpus ⋈ embeddings, corpus ⋈ quality scores) from two
 * full-data shuffles PER QUERY into one shuffle paid ONCE at write.
 *
 * Spark's bucketing metadata lives in the catalog, and the default
 * in-memory catalog is session-scoped — so this module registers
 * EXTERNAL bucketed tables over a persistent file location with
 * idempotent DDL (`CREATE TABLE IF NOT EXISTS ... CLUSTERED BY ...
 * LOCATION ...`): any later session re-attaches the same files with
 * the same bucket spec by re-running [[register]]. The files
 * themselves are written through Spark's bucketed writer (INSERT
 * into the DDL-defined table), so file-to-bucket assignment always
 * matches the declared spec — registering foreign files under a
 * WRONG spec would silently mis-join, which is why [[writeBucketed]]
 * owns both steps.
 *
 * `SORTED BY` is declared too: with one file per bucket Spark's scan
 * reports the sort order and the sort-merge join skips its sorts —
 * with several files per bucket it (correctly) re-sorts, still
 * without exchanges.
 */
object Bucketed {

  /** A catalog-safe table name keyed by the data location, so the
    * same name can never attach to a different SF directory's files
    * within one session. */
  def tableName(prefix: String, path: String): String =
    prefix + "_" + java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** SQL identifier quoting for interpolated DDL (backtick form). */
  private def qi(ident: String): String =
    "`" + ident.replace("`", "``") + "`"

  /** SQL string-literal escaping for the LOCATION clause — a quote
    * (or backslash) in a path must not break out of the literal. */
  private def qs(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Idempotently attach an external bucketed table over `path`.
    * `schemaDdl` is `df.schema.toDDL` (already identifier-quoted by
    * Spark); the spec must match what the files were written with
    * (see [[writeBucketed]]). Table/column names and the path are
    * escaped here, so quote-bearing paths cannot corrupt the DDL. */
  def register(spark: SparkSession, table: String, schemaDdl: String,
               bucketCol: String, buckets: Int, sortCol: String,
               path: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${qi(table)} ($schemaDdl)
          USING PARQUET
          CLUSTERED BY (${qi(bucketCol)}) SORTED BY (${qi(sortCol)})
          INTO $buckets BUCKETS
          LOCATION '${qs(path)}'""")

  /**
   * Write `df` as an external bucketed table at `path` and return
   * the table name: DDL first (owns the bucket spec), then INSERT
   * OVERWRITE through Spark's bucketed writer. One shuffle here buys
   * exchange-free joins for every later query on the key.
   */
  def writeBucketed(df: DataFrame, prefix: String, path: String,
                    bucketCol: String, buckets: Int,
                    sortCol: String = null): String = {
    val spark = df.sparkSession
    val table = tableName(prefix, path)
    val sort = if (sortCol == null) bucketCol else sortCol
    register(spark, table, df.schema.toDDL, bucketCol, buckets, sort,
      path)
    df.createOrReplaceTempView(s"${table}_src")
    spark.sql(s"INSERT OVERWRITE TABLE ${qi(table)} " +
      s"SELECT * FROM ${qi(table + "_src")}")
    table
  }

  /**
   * APPEND a batch into an existing bucketed table (idempotently
   * re-attaching first) — the per-ingest-batch path: each append
   * rides Spark's bucketed writer, so new rows land in files keyed
   * by the SAME bucket spec and joins stay exchange-free; with
   * several files per bucket the sort-merge join (correctly)
   * re-sorts, still without exchanges. At 100 TB this is the shape
   * that keeps the corpus ⋈ embeddings layout current as shards
   * arrive, without ever rewriting history. Appends are not
   * transactional across writers — serialize them per table (the
   * ChunkIndex discipline) or use a real table format for
   * concurrent-writer corpora.
   */
  def appendBucketed(df: DataFrame, prefix: String, path: String,
                     bucketCol: String, buckets: Int,
                     sortCol: String = null): String = {
    val spark = df.sparkSession
    val table = tableName(prefix, path)
    val sort = if (sortCol == null) bucketCol else sortCol
    register(spark, table, df.schema.toDDL, bucketCol, buckets, sort,
      path)
    df.createOrReplaceTempView(s"${table}_src")
    spark.sql(s"INSERT INTO ${qi(table)} " +
      s"SELECT * FROM ${qi(table + "_src")}")
    table
  }

  /** Re-attach (or no-op if already attached) a table previously
    * written by [[writeBucketed]] with the SAME spec, and read it.
    * The caller supplies the identical schema/spec — the contract is
    * that both calls share one code path in the caller. */
  def attach(spark: SparkSession, prefix: String, schemaDdl: String,
             bucketCol: String, buckets: Int, sortCol: String,
             path: String): DataFrame = {
    val table = tableName(prefix, path)
    register(spark, table, schemaDdl, bucketCol, buckets, sortCol, path)
    spark.table(table)
  }
}
