package graft

/**
 * Golden-plan snapshots for the most expensive registry queries.
 * PlanGuardSpec catches the catastrophic shapes (cartesians, global
 * windows); THIS spec catches plan DRIFT — a lost broadcast, an extra
 * exchange, a join strategy flip — which shows up as a silent bench
 * regression otherwise. Counts are pinned against the sf0.001 tables
 * (the same planning corpus as PlanGuardSpec, so statistics-driven
 * join picks are stable); a deliberate plan change updates the table
 * here, in the same commit, with the reason in the diff.
 *
 * Counted on the STATIC physical plan (pre-AQE): shuffle exchanges,
 * broadcast exchanges, and the join-strategy multiset.
 */
class GoldenPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def shape(name: String): (Int, Int, Map[String, Int]) =
    GoldenPlans.shape(spark, name, sfDir)

  // name -> (shuffle exchanges, broadcast exchanges, join multiset)
  private val golden: Map[String, (Int, Int, Map[String, Int])] =
    GoldenPlans.table

  test("expensive queries keep their golden plan shape") {
    val failures = golden.toSeq.sortBy(_._1).flatMap {
      case (name, want) =>
        val got = shape(name)
        if (got != want)
          Some(s"$name: got (shuffles=${got._1}, broadcasts=${got._2}, " +
            s"joins=${got._3}) want (shuffles=${want._1}, " +
            s"broadcasts=${want._2}, joins=${want._3})")
        else None
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}\n" +
      "If the change is deliberate, update GoldenPlans.table in the " +
      "same commit and say why in the message.")
  }
}
