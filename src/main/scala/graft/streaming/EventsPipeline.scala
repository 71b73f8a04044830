package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props).
 *
 * Extension beyond the reference (parquery is strictly batch, one file per
 * call — SURVEY.md §2.13). The transform functions here take a plain
 * `DataFrame`, so the SAME logic runs in batch (for the oracle-checked
 * queries) and under `readStream` (incremental, watermarked) — Spark's
 * unified batch/streaming model, where the reference's production system
 * instead re-runs batch aggregations when a writer publishes new shards.
 *
 * Scale notes: windowed aggregation state is bounded by the watermark
 * (late data beyond 1 hour is dropped, state evicted); keys are
 * (window, event_type) — low cardinality, no skew concern. The parquet
 * file-stream source tracks processed files in the checkpoint, which is
 * exactly the "concurrent writer publishes shard updates" scenario the
 * reference handles with inode pinning (SURVEY.md §2.1/S4) — solved here
 * by design instead of by fd tricks.
 */
object EventsPipeline {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window rollup; batch and streaming share this plan. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("win.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))

  /** Sliding-window per-user activity (10 min windows every 5 min). */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(col("win.start").as("win_start"), col("user_id"),
        col("n"), col("v"))

  /**
   * File-source streaming wiring: watch `inputDir` for new parquet files
   * (the reference's "concurrent writer publishes shards" scenario),
   * maintain the hourly rollup incrementally, write append-mode parquet.
   */
  def startFileStream(spark: SparkSession, inputDir: String,
                      checkpointDir: String, outputDir: String,
                      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    val in = spark.readStream.schema(eventsSchema).parquet(inputDir)
    hourlyRollup(in).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }
}
