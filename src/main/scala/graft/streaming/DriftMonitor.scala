package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.DataFrame

import graft.operators.Analytics

/**
 * Continuous distribution-drift monitoring: every micro-batch is
 * compared against a FIXED reference snapshot with
 * [[Analytics.distributionDrift]] (per-bin probabilities + total-
 * variation distance), and the per-batch drift rows are appended to a
 * parquet log — the streaming twin of the batch `q_drift` QA gate, so
 * an ingestion stream surfaces "the new crawl shifted" while it is
 * still running instead of at the next batch audit.
 *
 * Scale shape: the reference reduces ONCE per batch to its bin
 * histogram (bin-vocabulary-sized; at scale pre-aggregate the
 * reference histogram and hand it in as `reference` — same operator,
 * the histogram of a histogram is itself), the batch side to its own;
 * everything downstream of the two groupBys is bin-count-sized.
 * Output rows carry `batch_id` so the drift trajectory over time is
 * one ordered scan of the log.
 */
object DriftMonitor {

  /**
   * Start the monitor. Each micro-batch writes
   * (bin_lo, p_before, p_after, tv_distance) rows to the Hive-style
   * partition `outDir/batch_id=<epoch>`; `p_before` is the reference
   * side; read `outDir` with partition discovery for the full
   * trajectory. An empty batch writes nothing — guarded explicitly,
   * because `distributionDrift`'s full-outer join would otherwise keep
   * every reference bin and report the one-sided TV=1.0 convention for
   * a batch that simply contained no data. Idempotent under
   * foreachBatch replay: a re-run epoch OVERWRITES its own partition
   * (an append log would duplicate the replayed batch's rows after a
   * crash between commit and checkpoint).
   */
  def streamingDrift(stream: DataFrame, reference: DataFrame,
                     valueCol: String, width: Double,
                     outDir: String, checkpointDir: String,
                     trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty)
          Analytics.distributionDrift(reference, batch, valueCol, width)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$epoch")
      }
      .start()
}
