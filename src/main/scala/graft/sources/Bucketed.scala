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

  /**
   * Resolve the LIVE data directory under a logical table path.
   * Bucketed data lives in versioned subdirectories (`<path>/v0`,
   * `<path>/v1`, …) named by an atomic-rename-committed `_CURRENT`
   * pointer file — the ChunkIndex publish discipline, which is what
   * makes [[compact]] reader-atomic: a publish flips the pointer (and
   * the catalog location) without ever touching the files a running
   * query already listed. A path without a pointer (the pre-pointer
   * layout, or a directory of foreign parquet files) resolves to
   * itself.
   */
  def dataLocation(path: String): String = {
    val ptr = new java.io.File(path, "_CURRENT")
    if (ptr.isFile) {
      val v = new String(java.nio.file.Files.readAllBytes(ptr.toPath),
        "UTF-8").trim
      if (v.nonEmpty) new java.io.File(path, v).getPath else path
    } else path
  }

  /** Commit the `_CURRENT` pointer via write-temp + atomic rename —
    * a concurrent [[dataLocation]] sees the complete old or complete
    * new pointer, never a torn one. */
  private def commitPointer(path: String, version: String): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val tmp = new java.io.File(dir, "_CURRENT.tmp")
    java.nio.file.Files.write(tmp.toPath, version.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(dir, "_CURRENT").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Idempotently attach an external bucketed table over `path`
    * (resolved through [[dataLocation]]'s pointer when present).
    * `schemaDdl` is `df.schema.toDDL` (already identifier-quoted by
    * Spark); the spec must match what the files were written with
    * (see [[writeBucketed]]). Table/column names and the path are
    * escaped here, so quote-bearing paths cannot corrupt the DDL. */
  def register(spark: SparkSession, table: String, schemaDdl: String,
               bucketCol: String, buckets: Int, sortCol: String,
               path: String): Unit =
    registerAt(spark, table, schemaDdl, bucketCol, buckets, sortCol,
      dataLocation(path))

  /** [[register]] against an EXACT directory, no pointer resolution —
    * the private leg [[compact]] uses for version-dir side writes. */
  private def registerAt(spark: SparkSession, table: String,
                         schemaDdl: String, bucketCol: String,
                         buckets: Int, sortCol: String,
                         location: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${qi(table)} ($schemaDdl)
          USING PARQUET
          CLUSTERED BY (${qi(bucketCol)}) SORTED BY (${qi(sortCol)})
          INTO $buckets BUCKETS
          LOCATION '${qs(location)}'""")

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
    // a first write establishes the versioned layout (v0 + pointer)
    if (!new java.io.File(path, "_CURRENT").isFile)
      commitPointer(path, "v0")
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
   * arrive, without ever rewriting history. Appends serialize
   * against each other AND against [[compact]] on the shared
   * [[PathLock]] (same-JVM monitor + advisory file lock — the
   * ChunkIndex discipline); object-store deployments still need an
   * external coordinator or a real table format.
   */
  def appendBucketed(df: DataFrame, prefix: String, path: String,
                     bucketCol: String, buckets: Int,
                     sortCol: String = null): String =
    PathLock.withLock(path, "writer.lock") {
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
   * forever.
   *
   * The publish is READER-ATOMIC via the ChunkIndex discipline
   * (versioned directory + commit pointer), replacing the round-16
   * rename dance that could fail a query racing the swap:
   *  1. materialize the compacted copy into the NEXT version
   *    directory (`<path>/vN+1`) through the bucketed writer
   *    (pre-partitioned on the bucket column so each task owns
   *    exactly one bucket → one file);
   *  2. flip the table's catalog location (`ALTER TABLE ... SET
   *    LOCATION`) and commit the `_CURRENT` pointer by atomic
   *    rename — new plans resolve the compacted files;
   *  3. the PREVIOUS version's files are NOT deleted: a reader that
   *    planned before the flip keeps its file list valid to the end
   *    of its query. Superseded versions are garbage-collected one
   *    compact LATER (the grace window is a full compact cycle);
   *    BucketedSpec pins a reader planned pre-compact collecting
   *    correctly post-compact.
   * Appends and compacts serialize on the shared [[PathLock]] (the
   * ChunkIndex discipline): same-JVM racers queue on the interned
   * monitor, same-filesystem processes on the advisory file lock, so
   * an append either fully precedes the compact (its rows ride the
   * compacted copy) or fully follows the publish (its rows land in
   * the NEW version via the flipped catalog location). Object-store
   * deployments need an external coordinator or a real table format
   * — the documented boundary.
   */
  def compact(spark: SparkSession, prefix: String, schemaDdl: String,
              bucketCol: String, buckets: Int, sortCol: String,
              path: String): Unit =
    PathLock.withLock(path, "writer.lock") {
      compactLocked(spark, prefix, schemaDdl, bucketCol, buckets,
        sortCol, path)
    }

  private def compactLocked(spark: SparkSession, prefix: String,
                            schemaDdl: String, bucketCol: String,
                            buckets: Int, sortCol: String,
                            path: String): Unit = {
    val df = attach(spark, prefix, schemaDdl, bucketCol, buckets,
      sortCol, path)
    val table = tableName(prefix, path)
    val curLoc = dataLocation(path)
    val curName = new java.io.File(curLoc).getName
    // The catalog location this session is SERVING right now can
    // differ from the pointer: a crashed half-publish (ALTER TABLE
    // SET LOCATION committed, pointer commit did not) leaves the
    // catalog on an orphan version newer than `_CURRENT`. Readers in
    // this session planned against it, so it earns the same
    // one-cycle GC grace as the pointer's retiree — capture it
    // BEFORE this compact's own ALTER overwrites it.
    val preCatalogName = scala.util.Try {
      new java.io.File(spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table))
        .location).getName
    }.getOrElse(curName)
    val curVer =
      if (curLoc != path && curName.startsWith("v") &&
        curName.drop(1).nonEmpty && curName.drop(1).forall(_.isDigit))
        curName.drop(1).toInt
      else -1 // pre-pointer layout: data sits in `path` itself
    // never reuse an existing version dir (a crashed half-publish may
    // have left one newer than the pointer — and possibly already
    // serving this session's catalog entry)
    val maxVer = Option(new java.io.File(path).listFiles)
      .map(_.toSeq.collect {
        case f if f.isDirectory && f.getName.startsWith("v") &&
          f.getName.drop(1).nonEmpty &&
          f.getName.drop(1).forall(_.isDigit) => f.getName.drop(1).toInt
      }).getOrElse(Seq.empty).maxOption.getOrElse(-1)
    val newVerName = s"v${math.max(curVer, maxVer) + 1}"
    val newLoc = new java.io.File(path, newVerName).getPath
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
    val sort = if (sortCol == null) bucketCol else sortCol
    val tmpTable = tableName(s"${prefix}_compact_$newVerName", path)
    try {
      spark.sql(s"DROP TABLE IF EXISTS ${qi(tmpTable)}")
      registerAt(spark, tmpTable, schemaDdl, bucketCol, buckets, sort,
        newLoc)
      df.repartition(buckets,
          org.apache.spark.sql.functions.col(bucketCol))
        .createOrReplaceTempView(s"${tmpTable}_src")
      spark.sql(s"INSERT OVERWRITE TABLE ${qi(tmpTable)} " +
        s"SELECT * FROM ${qi(tmpTable + "_src")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled",
        absBefore)
    }
    // PUBLISH: catalog location flip (this session's planner), then
    // the pointer commit (future sessions' register). Neither step
    // touches the retiring version's files, so plans built before
    // this line keep reading a complete, consistent snapshot.
    spark.sql(s"ALTER TABLE ${qi(table)} SET LOCATION '${qs(newLoc)}'")
    commitPointer(path, newVerName)
    spark.sql(s"DROP TABLE IF EXISTS ${qi(tmpTable)}")
    spark.catalog.refreshTable(table)
    // grace-deferred GC: every version dir that is not the one just
    // PUBLISHED, the one just RETIRED, or the one the CATALOG was
    // serving at compact start goes. The third exemption is the
    // crashed-half-publish orphan: its ALTER TABLE committed, so
    // this session's readers may have planned against it even though
    // the pointer never flipped — it gets the same one-cycle grace
    // as the retiree. Truly unpublished dirs (no pointer, no catalog
    // entry ever) go immediately. Pre-pointer root data files go
    // once a versioned retiree exists to serve the grace window.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    Option(new java.io.File(path).listFiles).foreach(_.foreach { f =>
      val n = f.getName
      val staleVersion = f.isDirectory && n.startsWith("v") &&
        n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit) &&
        n != newVerName && n != curName && n != preCatalogName
      val legacyRootData = curVer >= 0 && curLoc != path && f.isFile &&
        !n.startsWith("_") && !n.startsWith(".")
      if (staleVersion || legacyRootData) rm(f)
    })
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
