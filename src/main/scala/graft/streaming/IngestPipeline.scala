package graft.streaming

import scala.util.Try

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/**
 * Continuous corpus ingestion with exact dedup against everything already
 * ingested: each micro-batch is [[Dedup.incrementalExact]]'d against the
 * corpus-so-far and only genuinely new documents are appended.
 *
 * Shape: `foreachBatch` — the batch-side anti-join reuses the exact same
 * operator the batch pipeline uses (one code path to trust), and history
 * enters the join as a DISTINCT hash projection, so a growing 100 TB
 * corpus costs one column scan of its hash column per batch — at scale,
 * point the `seen` projection at a compacted hash index instead of the
 * full corpus (same operator, narrower input; see SCALE.md).
 *
 * Exactly-once: foreachBatch can replay a batch after a failure; the
 * anti-join against the corpus makes the re-append a no-op for rows that
 * already landed (their hashes are now "seen") — idempotent by
 * construction, no transactional sink needed for this dedup semantics.
 */
object IngestPipeline {

  /**
   * Start the ingestion query. `stream` must carry `idCol` + `textCol`.
   * New unique documents are appended to `corpusDir` as parquet.
   */
  def dedupIngest(stream: DataFrame, idCol: String, textCol: String,
                  corpusDir: String, checkpointDir: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val seen = readCorpus(spark, corpusDir, idCol, textCol)
        Dedup.incrementalExact(batch, seen, idCol, textCol)
          .write.mode("append").parquet(corpusDir)
      }
      .start()

  /**
   * Near-dup-aware ingestion: each micro-batch runs the FULL admission
   * pipeline ([[Dedup.ingestAdmission]]: Bloom gate → exact anti-join →
   * banded MinHash near-dup gate) against the corpus-so-far, so
   * documents that are merely near-copies of already-ingested text are
   * rejected too — the streaming parity of the batch
   * `q_ingest_admission` composition, on the same operators.
   *
   * Exactly-once: a replayed batch's rows are exact duplicates of their
   * own earlier append, so the Bloom gate flags them and the exact
   * anti-join drops them — idempotent like [[dedupIngest]]. An empty
   * corpus needs no special case: the sketch is absent (nothing
   * flagged), the band index is empty (no candidates), and the
   * within-batch exact stage still dedups the first wave. The sketch
   * and band index are rebuilt from the corpus per batch here for
   * self-containment; production ingestion persists both beside the
   * corpus and feeds [[Dedup.bloomFlagsFromSketch]] /
   * [[Dedup.incrementalMinhash]] from them (same operators, no
   * per-batch history re-scan).
   */
  def nearDupIngest(stream: DataFrame, idCol: String, textCol: String,
                    corpusDir: String, checkpointDir: String,
                    minJaccard: Double = 0.8,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val seen = readCorpus(spark, corpusDir, idCol, textCol)
        Dedup.ingestAdmission(batch, seen, idCol, textCol,
            minJaccard = minJaccard)
          .write.mode("append").parquet(corpusDir)
      }
      .start()

  /** Corpus-so-far, or a typed empty frame before the first append. */
  private def readCorpus(spark: SparkSession, dir: String,
                         idCol: String, textCol: String): DataFrame =
    Try(spark.read.parquet(dir)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(textCol,
            org.apache.spark.sql.types.StringType)))))
}
