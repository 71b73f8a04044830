package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.EventsPipeline

/** Top-level for Encoder derivation. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, hourOffsetMin: Int, user: Long, typ: String,
                 v: Double): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 ${10 + hourOffsetMin / 60}%02d:${hourOffsetMin % 60}%02d:00"),
      user, typ, v, "{}")

  private val batch1 = Seq(
    ev(1, 0, 1, "click", 1.0), ev(2, 10, 2, "click", 2.0),
    ev(3, 20, 1, "view", 3.0))
  private val batch2 = Seq( // two hours later → advances watermark past hour 10
    ev(4, 125, 3, "click", 4.0))

  test("hourlyRollup batch semantics") {
    val got = EventsPipeline.hourlyRollup(batch1.toDF())
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("file-stream: watermark finalizes windows incrementally (append)") {
    val inDir = tmpDir()
    val ckDir = tmpDir()
    batch1.toDF().coalesce(1).write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(EventsPipeline.eventsSchema)
      .parquet(inDir)
    val q = EventsPipeline.hourlyRollup(stream).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("memory").queryName("rollup_test")
      .start()
    try {
      q.processAllAvailable()
      // watermark hasn't passed hour-10's end yet → nothing finalized
      assert(spark.table("rollup_test").count() == 0)
      batch2.toDF().coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val got = spark.table("rollup_test").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sliding windows emit overlapping buckets") {
    val got = EventsPipeline.slidingUserActivity(batch1.toDF()).collect()
    // each event lands in two 10-min windows sliding by 5
    assert(got.map(_.getLong(2)).sum == batch1.size * 2)
  }
}
