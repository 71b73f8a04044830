package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming CDC compaction: consume a change stream (upserts +
 * tombstones) and maintain a queryable latest-version snapshot on
 * plain parquet — the streaming twin of [[graft.operators.Merge]],
 * built on the same `mergeUpsert`. The reference has no write-side or
 * streaming surface at all (`parquery/README.md:4-8`); extension.
 *
 * Layout: the snapshot is LOG-STRUCTURED and bucket-partitioned —
 * `dir/epoch=<batchId>/bucket=<hash(key) % numBuckets>/part-*.parquet`.
 * A micro-batch rewrites ONLY the buckets its keys hash into: the
 * current state of each bucket is its newest committed epoch (tracked
 * by Spark's per-epoch `_SUCCESS` marker), so untouched buckets are
 * carried forward by reference, not by copy. Per-batch cost is
 * O(touched buckets + batch), independent of total snapshot size when
 * change keys are concentrated — the property that makes the shape
 * hold at 100 TB. (A manifest/catalog layer — Delta, Iceberg — would
 * track bucket→file mappings transactionally and add time travel;
 * directory listing + `_SUCCESS` is the dependency-free equivalent,
 * with the swap-atomicity caveats documented on
 * [[IngestPipeline]]'s sketch I/O.)
 *
 * Crash safety / replay: a retried batch re-reads the latest COMMITTED
 * state (a torn epoch directory has no `_SUCCESS` and is ignored) and
 * re-merges — `mergeUpsert` is idempotent under replay (re-applying a
 * change set to a snapshot that already absorbed it yields the same
 * winners: version ties resolve to the update side, whose payload
 * equals what is already there; tombstones of absent keys stay
 * absent).
 */
object CdcPipeline {

  /**
   * Start the compaction query. `changes` must carry `keyCols`,
   * `versionCol`, `deleteCol` and the payload columns.
   */
  def upsertStream(changes: DataFrame, snapshotDir: String,
                   checkpointDir: String, keyCols: Seq[String],
                   versionCol: String, deleteCol: String,
                   numBuckets: Int = 64,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        applyBatch(batch.sparkSession, batch, snapshotDir, keyCols,
          versionCol, deleteCol, numBuckets, epoch)
      }
      .start()

  /** Deterministic key→bucket routing (shared by write and read). */
  private def bucketOf(keyCols: Seq[String], numBuckets: Int) =
    pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets.toLong))
      .cast("int")

  /**
   * Apply one change batch to the snapshot (public: the exact function
   * a replayed micro-batch runs, so tests and backfills drive it
   * directly). Reads ONLY the buckets the batch's keys hash into,
   * merges, and writes those buckets under `epoch=<epoch>`.
   *
   * Commit protocol: the WHOLE epoch — data partitions, zero-row
   * sentinels for tombstoned-empty buckets, and the bucket-count
   * marker — is staged in a hidden dir and published by one atomic
   * rename, the same protocol as [[compactSnapshot]]. (A partitioned
   * write straight to `epoch=<n>` drops `_SUCCESS` before the
   * sentinels exist; a crash in that window left a committed-looking
   * epoch whose empty buckets were absent, resurrecting deleted keys —
   * transiently under streaming replay, permanently for direct
   * backfills.) A crash mid-stage leaves only an inert `.batch-*` dir
   * the listing never resolves; it is overwritten by the next attempt
   * at the same epoch id.
   *
   * `numBuckets` is adopted from the committed layout when one exists:
   * each committed epoch carries its bucket count in a marker file, so
   * a caller passing a different value cannot silently mis-route keys
   * (the touched-bucket set would miss the keys' real homes and stale
   * rows would survive beside their updates). Re-bucketing is
   * [[compactSnapshot]]'s job — the parameter only seeds a brand-new
   * snapshot.
   */
  def applyBatch(spark: SparkSession, batch: DataFrame,
                 snapshotDir: String, keyCols: Seq[String],
                 versionCol: String, deleteCol: String,
                 numBuckets: Int, epoch: Long): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    if (batch.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the committed layout's bucket count wins over the parameter —
    // mixed counts would route the same key to different homes
    val buckets = committedBucketCount(fs, snapshotDir) match {
      case Some(n) =>
        if (n != numBuckets)
          System.err.println(s"[cdc] adopting committed bucket count $n" +
            s" for $snapshotDir (caller passed $numBuckets; re-bucket" +
            " via compactSnapshot)")
        n
      case None => numBuckets
    }
    // bucket routing is HASH-OF-VALUE, and Spark hashes int and long
    // values differently — a batch whose key columns arrive with a
    // narrower type than the stored snapshot's would compute different
    // buckets for the same logical keys (touched set misses the keys'
    // real homes; stale rows survive beside their updates). Align the
    // batch's key types to the snapshot's BEFORE any hashing — and
    // verify the cast is LOSSLESS: a batch key wider than the stored
    // type (a long exceeding an int column) would otherwise
    // null/wrap silently and merge the row under a corrupted key.
    // Cast-back + null-safe compare catches every lossy case (null
    // stays null <=> null, so legitimate null keys pass).
    val aligned = snapshotKeyTypes(spark, snapshotDir, keyCols) match {
      case Some(types) =>
        val changed = keyCols.filter(k =>
          batch.schema(k).dataType != types(k))
        if (changed.nonEmpty) {
          // try_cast, not cast: under ANSI (the Spark 4 default) a lossy
          // cast throws mid-guard with an opaque arithmetic error — and
          // under non-ANSI it silently wraps, the exact corruption this
          // guard exists to catch. try_cast nulls both ways, and the
          // null-safe compare turns that into a violation row.
          val lossy = changed.map { k =>
            !(expr(s"try_cast(`$k` AS ${types(k).sql})")
              .cast(batch.schema(k).dataType) <=> col(k))
          }.reduce(_ || _)
          val examples = batch.where(lossy)
            .select(changed.map(col): _*).limit(3).collect()
          if (examples.nonEmpty)
            throw new IllegalArgumentException(
              s"batch key values do not fit the snapshot's stored key " +
                s"types ${changed.map(k => s"$k:${types(k)}").mkString(",")}" +
                s" (e.g. ${examples.mkString("; ")}) — widen the " +
                "snapshot via a compaction epoch before applying")
        }
        changed.foldLeft(batch)((df, k) =>
          df.withColumn(k, col(k).cast(types(k))))
      case None => batch
    }
    val bCol = bucketOf(keyCols, buckets)
    // touched-bucket set: bounded by bucket count (driver rows ≤ buckets
    // by construction — the same contract as Mixture's per-source collect)
    val touched = aligned.select(bCol.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSet
    val prev = readBuckets(spark, snapshotDir, Some(touched))
      .getOrElse(aligned.limit(0).drop(deleteCol))
    val merged = Merge.mergeUpsert(prev, aligned, keyCols, versionCol,
      deleteCol = Some(deleteCol))
    // the written epoch id must exceed EVERY committed epoch, not just
    // the stream's own batchIds: compactSnapshot writes epochs outside
    // the batchId sequence, and a resumed stream whose next batchId
    // collided with one would OVERWRITE it (destroying the compacted
    // snapshot). max(batchId, committed-max + 1) keeps replay semantics
    // — a retried batch whose own epoch already committed rewrites the
    // same content one epoch later, which is content-idempotent because
    // re-merging a change set into a state that absorbed it is a no-op.
    val effectiveEpoch = committedEpochs(fs, snapshotDir)
      .map(_.getName.stripPrefix("epoch=").toLong)
      .foldLeft(epoch)((e, c) => e.max(c + 1))
    val staged = s"$snapshotDir/.batch-$effectiveEpoch"
    merged
      .withColumn("bucket", bucketOf(keyCols, buckets))
      .write.mode("overwrite") // retried stage overwrites its own dir
      .partitionBy("bucket")
      .parquet(staged)
    // a bucket whose post-merge content is EMPTY (every key tombstoned)
    // writes no partition directory above — and an absent directory
    // would make the read side fall back to the older epoch,
    // resurrecting the deleted keys. Materialize every touched bucket
    // explicitly with a zero-row file so "empty now" is distinguishable
    // from "not rewritten here".
    touched.foreach { b =>
      val p = new org.apache.hadoop.fs.Path(s"$staged/bucket=$b")
      if (!fs.exists(p))
        merged.limit(0).write.mode("overwrite").parquet(p.toString)
    }
    writeBucketCount(fs, staged, buckets)
    commitEpoch(fs, staged, s"$snapshotDir/epoch=$effectiveEpoch")
  }

  /** Name of the per-epoch bucket-count marker file. Living INSIDE the
    * epoch dir, it is staged and renamed with the data — it can never
    * disagree with the committed layout the way a separately-written
    * root marker could after a crash between the two writes. */
  private val BucketCountMarker = "_GRAFT_BUCKETS"

  private def writeBucketCount(fs: org.apache.hadoop.fs.FileSystem,
      epochDir: String, n: Int): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(epochDir, BucketCountMarker), true)
    try out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Bucket count of the newest committed epoch carrying a marker —
    * None for a fresh dir (or one written before markers existed, where
    * the caller's parameter remains the only source of truth). */
  private def committedBucketCount(fs: org.apache.hadoop.fs.FileSystem,
      snapshotDir: String): Option[Int] =
    committedEpochs(fs, snapshotDir).reverseIterator.map { e =>
      val p = new org.apache.hadoop.fs.Path(e, BucketCountMarker)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
        finally in.close()
      }
    }.collectFirst { case Some(n) => n }

  /** Publish a fully-staged epoch dir with one atomic rename. The
    * target can pre-exist only as a TORN directory (no `_SUCCESS` —
    * garbage from a pre-staging-era crash): committed ids are
    * unreachable because effective epoch ids exceed every committed
    * epoch, so a committed target means a concurrent writer — fail
    * loudly rather than destroy its work. */
  private def commitEpoch(fs: org.apache.hadoop.fs.FileSystem,
      staged: String, target: String): Unit = {
    val s = new org.apache.hadoop.fs.Path(staged)
    val t = new org.apache.hadoop.fs.Path(target)
    if (fs.exists(t)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(t, "_SUCCESS"))) {
        fs.delete(s, true)
        throw new IllegalStateException(
          s"$target is already committed (concurrent writer?)")
      }
      fs.delete(t, true)
    }
    if (!fs.rename(s, t)) {
      fs.delete(s, true)
      throw new IllegalStateException(
        s"epoch commit failed: could not rename $staged to $target" +
          " (concurrent compaction or writer?)")
    }
  }

  /**
   * Read the current snapshot: for every bucket, its newest committed
   * epoch's files. One listing pass (epochs × buckets directory
   * entries — cluster metadata, not data), then a single multi-path
   * parquet scan.
   */
  def readSnapshot(spark: SparkSession, snapshotDir: String): DataFrame =
    readBuckets(spark, snapshotDir, bucketFilter = None)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed snapshot under $snapshotDir"))

  /**
   * Time-travel read: the snapshot AS OF `epoch` — every bucket served
   * from its newest committed epoch ≤ `epoch`, exactly the state a
   * reader saw after that batch applied. The log-structured layout
   * gives this for free (epochs are immutable once committed; the
   * "latest pointer" is just a listing bound), the lakehouse
   * time-travel feature without a table format: audit what a training
   * run actually read, reproduce a pipeline against yesterday's state,
   * bisect a bad upstream batch. Bounded by retention — epochs deleted
   * after a [[compactSnapshot]] are gone, and a requested point
   * entirely before the oldest committed epoch fails loudly rather
   * than serving a partial state.
   */
  def readSnapshotAsOf(spark: SparkSession, snapshotDir: String,
                       epoch: Long): DataFrame =
    readBuckets(spark, snapshotDir, bucketFilter = None,
        maxEpoch = Some(epoch))
      .getOrElse(throw new IllegalArgumentException(
        s"no epoch <= $epoch committed under $snapshotDir " +
          "(beyond retention, or never written)"))

  /** Committed epoch dirs (have `_SUCCESS`), ascending by epoch id —
    * the one commit-protocol listing shared by every reader/writer. */
  private def committedEpochs(fs: org.apache.hadoop.fs.FileSystem,
      snapshotDir: String): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(snapshotDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("epoch="))
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .sortBy(p => p.getName.stripPrefix("epoch=").toLong)
      .toSeq
  }

  /** Latest committed epoch dir per bucket; None when nothing committed.
    * `bucketFilter = None` means all buckets; `maxEpoch` bounds the
    * listing for time-travel reads. */
  private def readBuckets(spark: SparkSession, snapshotDir: String,
                          bucketFilter: Option[Set[Int]],
                          maxEpoch: Option[Long] = None): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochs = committedEpochs(fs, snapshotDir)
      .filter(p => maxEpoch.forall(
        p.getName.stripPrefix("epoch=").toLong <= _))
    if (epochs.isEmpty) return None
    // newest committed epoch wins per bucket
    val latest = scala.collection.mutable.Map.empty[Int, String]
    epochs.foreach { e =>
      fs.listStatus(e).filter(_.isDirectory).foreach { b =>
        val name = b.getPath.getName
        if (name.startsWith("bucket=")) {
          val id = name.stripPrefix("bucket=").toInt
          if (bucketFilter.forall(_.contains(id)))
            latest(id) = b.getPath.toString
        }
      }
    }
    if (latest.isEmpty) None
    // mergeSchema: buckets can come from DIFFERENT epochs, and later
    // epochs may have gained columns (mergeUpsert aligns drifted change
    // schemas via unionEvolve) — a single-footer schema sample would
    // silently drop or null them depending on which file is sampled.
    // Physical TYPE changes across epochs (e.g. int -> long widening)
    // are beyond parquet schema merge: run a full-snapshot compaction
    // epoch after such a migration.
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(latest.values.toSeq: _*))
  }

  /**
   * Full-snapshot compaction: rewrite the CURRENT state of every
   * bucket into one fresh epoch. After it commits, every older epoch
   * directory is garbage (no bucket's latest pointer references it)
   * and can be deleted by the caller's retention policy — the
   * log-structured layout's answer to unbounded epoch accumulation,
   * and the migration step that makes cross-epoch physical-type
   * changes safe (post-compaction every live file shares one schema).
   * Write-only: concurrent readers keep resolving against the old
   * epochs until the new `_SUCCESS` lands. Returns the epoch id
   * written (max committed + 1).
   */
  def compactSnapshot(spark: SparkSession, snapshotDir: String,
                      keyCols: Seq[String], numBuckets: Int): Long = {
    val fs = new org.apache.hadoop.fs.Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = committedEpochs(fs, snapshotDir)
    require(committed.nonEmpty, s"nothing committed under $snapshotDir")
    val next = committed.map(_.getName.stripPrefix("epoch=").toLong).max + 1
    val snap = readSnapshot(spark, snapshotDir)
    // STAGE the whole epoch in a hidden dir and rename it into place:
    // the main parquet write drops its _SUCCESS before the empty-bucket
    // shadow files below exist, and a reader (or crash) in that window
    // would see a committed-looking epoch whose tombstoned-empty
    // buckets are absent — resurrecting deleted keys from older epochs,
    // permanently (nothing replays a compaction). The listing ignores
    // non-"epoch=" names, so the staged dir is invisible until the
    // rename; rename is atomic on HDFS/local (object-store caveat as
    // documented on IngestPipeline's sketch I/O).
    val staged = s"$snapshotDir/.compact-$next"
    snap.withColumn("bucket", bucketOf(keyCols, numBuckets))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(staged)
    // every bucket id visible in ANY older epoch must resolve to this
    // epoch afterwards — including buckets that are empty now, and ids
    // beyond a smaller re-bucketing — otherwise their latest pointer
    // keeps referencing an "older epochs are garbage" directory
    val priorIds = committed.flatMap { e =>
      fs.listStatus(e).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("bucket="))
    }.toSet
    priorIds.foreach { name =>
      val p = new org.apache.hadoop.fs.Path(s"$staged/$name")
      if (!fs.exists(p))
        snap.limit(0).write.mode("overwrite").parquet(p.toString)
    }
    // compaction is THE re-bucketing path: the marker it stages becomes
    // the layout's bucket count, which applyBatch adopts from then on
    writeBucketCount(fs, staged, numBuckets)
    commitEpoch(fs, staged, s"$snapshotDir/epoch=$next")
    next
  }

  /** Key-column types of the newest committed snapshot — a footer-only
    * schema read; None when nothing is committed yet. */
  private def snapshotKeyTypes(spark: SparkSession, snapshotDir: String,
      keyCols: Seq[String])
      : Option[Map[String, org.apache.spark.sql.types.DataType]] =
    readBuckets(spark, snapshotDir, bucketFilter = None).map { df =>
      keyCols.map(k => k -> df.schema(k).dataType).toMap
    }
}
