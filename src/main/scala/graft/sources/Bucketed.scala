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

  /**
   * Compact a bucketed table's accumulated append files (each
   * [[appendBucketed]] batch adds one file set) back down to ~one
   * file per bucket: the steady-state maintenance the append path
   * creates a need for — without it, a 1000-batch corpus pays a
   * 1000-file-per-bucket scan and the sort-merge join re-sorts
   * forever. Sequence: materialize a compacted copy into a side
   * directory THROUGH the bucketed writer (pre-partitioned on the
   * bucket column so each task owns exactly one bucket → one file),
   * then swap directories and refresh — the original table's catalog
   * entry (location-keyed) now serves the compacted files. The swap
   * is not atomic for concurrent READERS on a plain filesystem;
   * serialize compaction with queries the way appends are
   * serialized (or use a real table format for that guarantee).
   */
  def compact(spark: SparkSession, prefix: String, schemaDdl: String,
              bucketCol: String, buckets: Int, sortCol: String,
              path: String): Unit = {
    val df = attach(spark, prefix, schemaDdl, bucketCol, buckets,
      sortCol, path)
    val tmpPath = path + ".compact"
    // One file per bucket needs each write task to own exactly one
    // bucket. The clean way is reading the SOURCE through its
    // bucketed scan (4 aligned partitions); the planner interplay
    // that breaks the naive form is worth naming: a repartition on
    // the bucket column gets elided as redundant against the
    // bucketed scan's partitioning, and THEN
    // DisableUnnecessaryBucketedScan de-buckets the scan (the write
    // declares no distribution requirement) — leaving neither, so
    // every task holds every bucket. Pinning autoBucketedScan OFF
    // (which FORCES the bucketed scan, the BucketedSpec pruning-test
    // config) keeps the aligned partitioning; AQE off keeps local
    // shuffle reads from re-merging if a shuffle does materialize.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val absBefore = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val tmpTable =
      try writeBucketed(
        df.repartition(buckets, org.apache.spark.sql.functions
          .col(bucketCol)),
        prefix + "_compact", tmpPath, bucketCol, buckets, sortCol)
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
        spark.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled",
          absBefore)
      }
    // swap: originals step ASIDE first (never deleted before the
    // compacted copy is in place — a failed rename leaves both copies
    // on disk, recoverable), then the compacted dir takes the
    // location, then the originals go
    val fs = new java.io.File(path)
    val tmp = new java.io.File(tmpPath)
    val old = new java.io.File(path + ".precompact")
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmr))
      f.delete(); ()
    }
    rmr(old) // a previous failed swap's leftover
    require(fs.renameTo(old), s"compact swap failed: $path aside")
    if (!tmp.renameTo(fs)) {
      old.renameTo(fs) // roll back; originals intact
      throw new IllegalStateException(
        s"compact swap failed: $tmpPath -> $path (rolled back)")
    }
    rmr(old)
    spark.sql(s"DROP TABLE IF EXISTS ${qi(tmpTable)}")
    // both caches go stale at the swap: the path's shared file-status
    // cache AND the original table's relation cache
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshTable(tableName(prefix, path))
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
