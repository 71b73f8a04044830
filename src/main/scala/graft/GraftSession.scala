package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory embodying the engine's scale configuration. One place
 * for every knob, so local harnesses and cluster deployments share the
 * same posture.
 *
 * The defaults and why (all public Spark configuration):
 *  - AQE on (default in Spark 4, pinned explicitly): runtime re-planning
 *    replaces the reference's hand-rolled heuristics — coalescing tiny
 *    shuffle partitions stands in for "disable pre-aggregation at ≥5
 *    dims", skew-join splitting stands in for nothing the reference has
 *    (`parquery/aggregate_pyarrow.py:98-116` — do NOT port those magic
 *    constants).
 *  - `shuffle.partitions` sized to the core count locally; on a cluster
 *    leave AQE's coalescing to shrink from a generous initial number.
 *  - `files.maxPartitionBytes` 128m (default): one task per ~128 MB split
 *    is the distributed analog of the reference's one-row-group-at-a-time
 *    streaming read (`parquery/aggregate_pyarrow.py:157-167`) — bounded
 *    memory per task, no giant partitions.
 *  - session timezone pinned UTC: timestamp semantics must not depend on
 *    executor locale (and the DuckDB verify oracle runs UTC).
 *  - parquet filter pushdown + vectorized reader are Spark defaults the
 *    engine RELIES on (SURVEY.md §4 O1/O2); pinned against env drift.
 */
object GraftSession {

  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.enableVectorizedReader", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
    master.fold(b)(b.master)
  }

  /** Local session for tools/harnesses: local[n], n shuffle partitions. */
  def local(appName: String, cores: Int, uiEnabled: Boolean = false)
      : SparkSession = {
    val s = builder(appName, Some(s"local[$cores]"), Some(cores))
      .config("spark.ui.enabled", uiEnabled.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
