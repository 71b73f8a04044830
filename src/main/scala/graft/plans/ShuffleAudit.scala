package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/**
 * Shuffle-VOLUME audit: execute a query once and report, per shuffle
 * exchange, the bytes and records actually written — the mechanical
 * check behind every "exchanges carry (id, hash) longs, never text"
 * claim in this codebase. Plan-SHAPE pins (GoldenPlanSpec) catch a
 * lost broadcast or an extra exchange; this catches the quieter
 * regression where the exchange COUNT is unchanged but a wide column
 * (document text, raw media bytes, full embeddings) starts riding a
 * shuffle that used to carry keys — at 100 TB that's the difference
 * between shuffling gigabytes and shuffling the corpus.
 *
 * Measurement comes from the SQL metrics of the executed plan
 * (`shuffleBytesWritten` / `shuffleRecordsWritten` on each
 * [[ShuffleExchangeLike]]), so it needs no listener and has no event
 * race; AQE query stages are unwrapped and reused exchanges are
 * deduplicated by identity so shared stages count once. Bytes are
 * post-compression (what the wire/disk would carry). RDD-level
 * shuffles inside iterative operators' `localCheckpoint` rounds are
 * outside the SQL plan and thus out of scope here — those operators
 * pin their per-round plan shape instead.
 */
object ShuffleAudit {

  /** One executed shuffle exchange's written volume. `avgRowBytes` is
    * the load-bearing number: a key-only exchange sits in the tens of
    * bytes per row; document text or embeddings push it into the
    * hundreds-to-thousands. */
  final case class ExchangeVolume(bytes: Long, records: Long) {
    def avgRowBytes: Double =
      if (records == 0) 0.0 else bytes.toDouble / records
  }

  /** Whole-query audit: every distinct shuffle exchange's volume plus
    * the totals, in plan-walk order. */
  final case class QueryVolume(exchanges: Seq[ExchangeVolume]) {
    def totalBytes: Long = exchanges.map(_.bytes).sum
    def totalRecords: Long = exchanges.map(_.records).sum
    def maxAvgRowBytes: Double =
      if (exchanges.isEmpty) 0.0 else exchanges.map(_.avgRowBytes).max
  }

  /** Execute `df` (noop-style full scan of the query's own plan — the
    * SAME QueryExecution whose metrics are read, not a re-planned
    * sink write) and collect per-exchange shuffle write volumes. */
  def audit(df: DataFrame): QueryVolume = {
    val qe = df.queryExecution
    // run THIS QueryExecution to populate its SQL metrics
    qe.toRdd.foreachPartition(_ => ())
    val exchanges =
      collectExchanges(qe.executedPlan)
    QueryVolume(exchanges.map { e =>
      def metric(key: String): Long =
        e.metrics.get(key).map(_.value).getOrElse(0L)
      ExchangeVolume(metric("shuffleBytesWritten"),
        metric("shuffleRecordsWritten"))
    })
  }

  /** Distinct [[ShuffleExchangeLike]] nodes of the FINAL (adaptive)
    * plan, reused exchanges deduplicated by reference identity. */
  private def collectExchanges(plan: SparkPlan): Seq[ShuffleExchangeLike] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[ShuffleExchangeLike, java.lang.Boolean]())
    val out = Seq.newBuilder[ShuffleExchangeLike]
    def walk(p: SparkPlan): Unit = p.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // EVERY query-stage flavor is a traversal LEAF wrapping a real
      // subtree — Result/Shuffle/Broadcast/TableCache stages alike
      // (Spark 4 wraps even the final plan in ResultQueryStageExec)
      case s: QueryStageExec => walk(s.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case e: ShuffleExchangeLike =>
        if (seen.add(e)) out += e
        // an exchange's CHILD subtree may hold further stages (AQE
        // nests query stages); collectWithSubqueries already recurses
        // into children, so nothing extra to do here
    }
    walk(plan)
    out.result()
  }
}
