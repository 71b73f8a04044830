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
   */
  def applyBatch(spark: SparkSession, batch: DataFrame,
                 snapshotDir: String, keyCols: Seq[String],
                 versionCol: String, deleteCol: String,
                 numBuckets: Int, epoch: Long): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    if (batch.isEmpty) return
    // bucket routing is HASH-OF-VALUE, and Spark hashes int and long
    // values differently — a batch whose key columns arrive with a
    // narrower type than the stored snapshot's would compute different
    // buckets for the same logical keys (touched set misses the keys'
    // real homes; stale rows survive beside their updates). Align the
    // batch's key types to the snapshot's BEFORE any hashing.
    val aligned = snapshotKeyTypes(spark, snapshotDir, keyCols) match {
      case Some(types) =>
        keyCols.foldLeft(batch) { (df, k) =>
          val want = types(k)
          if (df.schema(k).dataType == want) df
          else df.withColumn(k, col(k).cast(want))
        }
      case None => batch
    }
    val bCol = bucketOf(keyCols, numBuckets)
    // touched-bucket set: bounded by numBuckets (driver rows ≤ numBuckets
    // by construction — the same contract as Mixture's per-source collect)
    val touched = aligned.select(bCol.as("__b")).distinct()
      .collect().map(_.getInt(0)).toSet
    val prev = readBuckets(spark, snapshotDir, Some(touched))
      .getOrElse(aligned.limit(0).drop(deleteCol))
    val merged = Merge.mergeUpsert(prev, aligned, keyCols, versionCol,
      deleteCol = Some(deleteCol))
    val epochDir = s"$snapshotDir/epoch=$epoch"
    merged
      .withColumn("bucket", bucketOf(keyCols, numBuckets))
      .write.mode("overwrite") // retried epoch overwrites its own dir
      .partitionBy("bucket")
      .parquet(epochDir)
    // a bucket whose post-merge content is EMPTY (every key tombstoned)
    // writes no partition directory above — and an absent directory
    // would make the read side fall back to the older epoch,
    // resurrecting the deleted keys. Materialize every touched bucket
    // explicitly with a zero-row file so "empty now" is distinguishable
    // from "not rewritten here".
    val fs = new org.apache.hadoop.fs.Path(epochDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val p = new org.apache.hadoop.fs.Path(s"$epochDir/bucket=$b")
      if (!fs.exists(p))
        merged.limit(0).write.mode("overwrite").parquet(p.toString)
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

  /** Latest committed epoch dir per bucket; None when nothing committed.
    * `bucketFilter = None` means all buckets. */
  private def readBuckets(spark: SparkSession, snapshotDir: String,
                          bucketFilter: Option[Set[Int]]): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(snapshotDir))) return None
    val epochs = fs.listStatus(new org.apache.hadoop.fs.Path(snapshotDir))
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("epoch="))
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .sortBy(p => p.getName.stripPrefix("epoch=").toLong)
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
    val committed = fs.listStatus(new org.apache.hadoop.fs.Path(snapshotDir))
      .filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("epoch="))
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("epoch=").toLong)
    require(committed.nonEmpty, s"nothing committed under $snapshotDir")
    val next = committed.max + 1
    val snap = readSnapshot(spark, snapshotDir)
    val nextDir = s"$snapshotDir/epoch=$next"
    snap.withColumn("bucket", bucketOf(keyCols, numBuckets))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(nextDir)
    // every bucket id visible in ANY older epoch must resolve to this
    // epoch afterwards — including buckets that are empty now, and ids
    // beyond a smaller re-bucketing — otherwise their latest pointer
    // keeps referencing an "older epochs are garbage" directory
    val priorIds = committed.flatMap { e =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$snapshotDir/epoch=$e"))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("bucket="))
    }.toSet
    priorIds.foreach { name =>
      val p = new org.apache.hadoop.fs.Path(s"$nextDir/$name")
      if (!fs.exists(p))
        snap.limit(0).write.mode("overwrite").parquet(p.toString)
    }
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
