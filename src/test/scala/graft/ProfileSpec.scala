package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profileNumeric: one row per column, hand-checked stats") {
    val df = Seq(
      (1L, Option(2.0)), (2L, Option(4.0)), (2L, None), (5L, Option(10.0))
    ).toDF("a", "b")
    val got = Profile.profileNumeric(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got("a") == (4L, 4L, 3L, 1.0, 5.0, 2.5))
    // b: one null → 3 non-null, distinct {2,4,10}, avg skips nulls
    assert(got("b") == (4L, 3L, 3L, 2.0, 10.0, 5.3333))
  }

  test("approx distinct path: sketch estimate close, same shape") {
    val df = (1 to 5000).map(i => (i.toLong % 997, i * 1.5)).toDF("x", "y")
    val got = Profile.profileNumeric(df, Seq("x"), exactDistinct = false)
      .collect()(0)
    assert(got.getString(0) == "x" && got.getLong(1) == 5000L)
    val nd = got.getLong(3).toDouble
    assert(math.abs(nd - 997.0) / 997.0 < 0.1) // HLL default ~2% rsd
  }

  test("profileNumeric runs as one aggregation pass (no per-column scans)") {
    val df = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("x", "y")
    val plan = Profile.profileNumeric(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    // a per-column loop would union several aggregates; one pass has no
    // Union in the physical plan
    assert(!plan.contains("Union"), plan.take(800))
  }
}
