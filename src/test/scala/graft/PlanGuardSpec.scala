package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/**
 * Registry-wide scale-pattern guard: every `SparkEntry.queries` entry is
 * planned against the sf0.001 tables and its plan asserted free of the
 * two anti-patterns that kill a 100 TB run silently:
 *
 *  - a CartesianProduct (an all-pairs shuffle join; `crossJoin` against
 *    a `broadcast()` side plans as BroadcastNestedLoopJoin and is NOT
 *    flagged — that's the intentional small-side pattern);
 *  - a Window with an empty partitionSpec (single-partition total order:
 *    the whole dataset funnels through one task), except the documented
 *    two-phase offset windows in Ids/Pack, which window over one row
 *    per partition by construction.
 *
 * A future query that reintroduces either shape fails THIS spec by name
 * instead of becoming a bench regression three rounds later.
 */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Two-phase ordinal/packing ops: their second phase windows over the
    * per-partition aggregate frame (one row per partition — bounded by
    * parallelism, not data), documented in Ids/Pack scaladoc. */
  private val globalWindowAllowed =
    Set("q_assign_ids", "q_pack_sequences", "q_token_budget",
      "q_export_pipeline", "q_pack_text")

  test("no registry query plans a cartesian product or a global window") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val cartesian = qe.sparkPlan.collectWithSubqueries {
          case c: CartesianProductExec => c
        }
        if (cartesian.nonEmpty)
          failures += s"$name: CartesianProduct in physical plan"
        val globalWins = qe.optimizedPlan.collectWithSubqueries {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }
        if (globalWins.nonEmpty && !globalWindowAllowed(name))
          failures += s"$name: Window with empty partitionSpec " +
            "(single-partition total order)"
      } catch {
        case e: Throwable =>
          failures += s"$name: planning failed: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
