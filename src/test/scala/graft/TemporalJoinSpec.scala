package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), 100.0),
    (1L, ts("2024-01-01 10:00:30"), 101.0),
    (2L, ts("2024-01-01 10:00:10"), 200.0),
    (3L, ts("2024-01-01 10:00:10"), 300.0) // key with no quotes at all
  ).toDF("sym", "tts", "px")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 99.5),
    (1L, ts("2024-01-01 10:00:30"), 100.5), // equal-ts: must match
    (1L, ts("2024-01-01 10:00:40"), 101.5), // future: never matches
    (2L, ts("2024-01-01 09:00:00"), 199.0) // stale quote
  ).toDF("sym", "qts", "bid")

  private def asofTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(2),
      Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

  test("asofJoin matches newest at-or-before right row per key") {
    val got = asofTuples(TemporalJoin.asofJoin(trades, quotes,
      Seq("sym"), "tts", "qts", Seq("bid")))
    assert(got == Set(
      (1L, 100.0, Some(99.5)),
      (1L, 101.0, Some(100.5)), // equal timestamp matches
      (2L, 200.0, Some(199.0)),
      (3L, 300.0, None))) // left-join semantics: no match → null
  }

  test("asofJoin tolerance nulls stale matches") {
    val got = asofTuples(TemporalJoin.asofJoin(trades, quotes,
      Seq("sym"), "tts", "qts", Seq("bid"), toleranceSec = Some(60)))
    assert(got == Set(
      (1L, 100.0, Some(99.5)),
      (1L, 101.0, Some(100.5)),
      (2L, 200.0, None), // only quote is an hour old → outside tolerance
      (3L, 300.0, None)))
  }

  test("asofJoin ≡ naive join-argmax on random data") {
    val rnd = new scala.util.Random(11)
    val t = (1 to 300).map { i =>
      (i.toLong, (i % 3).toLong,
        ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        rnd.nextDouble())
    }.toDF("tid", "sym", "tts", "px")
    // distinct (sym, minute) quotes → deterministic match values
    val q = rnd.shuffle((0 until 24 * 60).toList).take(200).zipWithIndex
      .map { case (m, i) =>
        ((i % 3).toLong, ts(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00"),
          rnd.nextDouble())
      }.toDF("sym", "qts", "bid")
    val got = TemporalJoin.asofJoin(t, q, Seq("sym"), "tts", "qts",
      Seq("bid"))
      .select("tid", "bid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val best = t.join(q, Seq("sym")).where(col("qts") <= col("tts"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("tid").orderBy(col("qts").desc)))
      .where(col("__rn") === 1).select("tid", "bid")
    val naive = t.select("tid").join(best, Seq("tid"), "left")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == naive)
  }

  test("null timestamps: asof rows match nothing, range points drop") {
    // dirty-data contract: a null event time cannot assert an order —
    // it must not match, and must not poison other rows
    val t = Seq((1L, Option(ts("2024-01-01 10:00:05")), 100.0),
      (1L, Option.empty[Timestamp], 101.0))
      .toDF("sym", "tts", "px")
    val gotAsof = asofTuples(TemporalJoin.asofJoin(t, quotes,
      Seq("sym"), "tts", "qts", Seq("bid")))
    assert(gotAsof == Set((1L, 100.0, Some(99.5)), (1L, 101.0, None)))

    val points = Seq((10L, Option(ts("2024-01-02 00:00:00"))),
      (11L, Option.empty[Timestamp])).toDF("pid", "pts")
    val ranges = Seq((100L, ts("2024-01-01 00:00:00"),
      ts("2024-01-03 00:00:00"))).toDF("rid", "rs", "re")
    val gotRange = TemporalJoin.rangeJoin(points, ranges, "pts",
      "rs", "re", binSeconds = 86400)
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(gotRange == Seq(10L))
  }

  test("asofJoin plans one key shuffle + window — no join operator") {
    val plan = TemporalJoin.asofJoin(trades, quotes, Seq("sym"),
      "tts", "qts", Seq("bid")).queryExecution.executedPlan.toString
    // the union-and-scan shape: any *Join exec would mean the operator
    // regressed to the pairing formulation
    assert(!plan.contains("HashJoin") && !plan.contains("SortMergeJoin") &&
      !plan.contains("NestedLoop"), plan.take(1200))
    assert(plan.contains("Window"), plan.take(1200))
  }

  test("rangeJoin plans an equi-join on bins — never a cartesian") {
    val points = Seq((10L, ts("2024-01-01 00:00:00"))).toDF("pid", "pts")
    val ranges = Seq((100L, ts("2024-01-01 00:00:00"),
      ts("2024-01-03 00:00:00"))).toDF("rid", "rs", "re")
    val plan = TemporalJoin.rangeJoin(points, ranges, "pts", "rs", "re",
      binSeconds = 86400).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("rangeJoin: inclusive bounds, multi-bin ranges, invalid dropped") {
    val points = Seq(
      (10L, ts("2024-01-01 00:00:00")),
      (11L, ts("2024-01-03 00:00:00")),
      (12L, ts("2024-01-10 00:00:00"))).toDF("pid", "pts")
    val ranges = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (101L, ts("2024-01-05 00:00:00"), ts("2024-01-04 00:00:00")), // bad
      (102L, ts("2024-01-02 00:00:00"), ts("2024-01-20 00:00:00"))
    ).toDF("rid", "rs", "re")
    val got = TemporalJoin.rangeJoin(points, ranges, "pts", "rs", "re",
      binSeconds = 86400)
      .select("pid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L), (11L, 100L), (11L, 102L), (12L, 102L)))
  }

  test("rangeJoin with key columns restricts matches to the key") {
    val points = Seq((1L, 10L, ts("2024-01-02 00:00:00")),
      (2L, 11L, ts("2024-01-02 00:00:00"))).toDF("k", "pid", "pts")
    val ranges = Seq((1L, 100L, ts("2024-01-01 00:00:00"),
      ts("2024-01-05 00:00:00"))).toDF("k", "rid", "rs", "re")
    val got = TemporalJoin.rangeJoin(points, ranges, "pts", "rs", "re",
      binSeconds = 86400, keyCols = Seq("k"))
      .select("pid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L))) // pid 11 is on key 2 → no match
  }

  test("rangeJoin ≡ naive between-join on random data") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 200).map { i =>
      (i.toLong,
        ts(f"2024-01-${rnd.nextInt(28) + 1}%02d ${rnd.nextInt(24)}%02d:00:00"))
    }.toDF("pid", "pts")
    val ranges = (1 to 50).map { i =>
      val d = rnd.nextInt(28) + 1
      val len = rnd.nextInt(5)
      (i.toLong, ts(f"2024-01-$d%02d 00:00:00"),
        ts(f"2024-01-${math.min(d + len, 28)}%02d 12:00:00"))
    }.toDF("rid", "rs", "re")
    val got = TemporalJoin.rangeJoin(points, ranges, "pts", "rs", "re",
      binSeconds = 86400 * 3)
      .select("pid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(ranges)
      .where(col("pts").between(col("rs"), col("re")))
      .select("pid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
  }
}
