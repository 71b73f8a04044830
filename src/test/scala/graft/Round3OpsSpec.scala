package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Analytics, Dedup, Embeddings, FuzzyJoin}

/** Round-3 operators: span dedup, C4 filter, fuzzy join, embedding
  * transforms, event analytics. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- duplicateSpans -----------------------------------------------------

  test("duplicateSpans flags the shared paragraph, not unique text") {
    val para = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared words
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa $para"),
      (2L, s"one two three four five six seven eight nine ten eleven $para"),
      (3L, "totally unrelated words that appear nowhere else in this corpus " +
        "spanning enough tokens to form several windows of ten")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", spanWords = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1+2 share the 12-word suffix => its 3 windows duplicate
    assert(out(1L)._2 == 3L && out(2L)._2 == 3L)
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    // doc 1: 21 tokens + 12 shared = 33? no: 10 + 12 = 22 tokens -> 13 windows
    assert(out(1L)._1 == 13L)
  }

  test("duplicateSpans: doc shorter than the span is one window") {
    val docs = Seq((1L, "just four small words"), (2L, "just four small words"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", spanWords = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 1L)) // one whole-doc window, duplicated across docs
  }

  // ---- c4Signals ----------------------------------------------------------

  test("c4Signals: word-count band, brace and lorem flags gate keep") {
    val good = (1 to 60).map(i => s"word$i").mkString(" ") + "."
    val docs = Seq(
      (1L, good),
      (2L, good + " function() { return 0; }"),   // brace -> drop
      (3L, good.replace("word1", "Lorem Ipsum")), // boilerplate -> drop
      (4L, "too short to keep.")                  // < 50 words -> drop
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Signals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1)
    assert(out(1L).getAs[Int]("ends_punct") == 1)
    assert(out(2L).getAs[Int]("has_brace") == 1 && out(2L).getAs[Int]("keep") == 0)
    assert(out(3L).getAs[Int]("has_lorem") == 1 && out(3L).getAs[Int]("keep") == 0)
    assert(out(4L).getAs[Int]("keep") == 0)
  }

  // ---- FuzzyJoin ----------------------------------------------------------

  test("levenshteinJoin matches within maxDist through the block") {
    val left = Seq((1L, "spark engine"), (2L, "quantum leap"), (3L, "zz top"))
      .toDF("id", "name")
    val right = Seq((10L, "spark enginf"),  // dist 1, same prefix/band
      (20L, "quantum jump"),                // dist 3 -> excluded
      (30L, "zz tip")).toDF("id", "name")   // dist 1
    val out = FuzzyJoin.levenshteinJoin(left, "id", "name",
      right, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(out == Set((1L, 10L, 1), (3L, 30L, 1)))
  }

  test("levenshteinJoin catches pairs straddling a length band boundary") {
    // len 8 (band 1) vs len 7 (band 0): neighbor-band probe must find it
    val left = Seq((1L, "abcdefgh")).toDF("id", "name")
    val right = Seq((2L, "abcdefg")).toDF("id", "name")
    val out = FuzzyJoin.levenshteinJoin(left, "id", "name",
      right, "id", "name", maxDist = 1)
    assert(out.count() == 1)
  }

  // ---- Embeddings ---------------------------------------------------------

  test("l2Normalize produces unit vectors; zero vector passes through") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("id", "vec")
    val out = Embeddings.l2Normalize(df, "vec", "u")
      .select(col("id"), col("u")).as[(Long, Array[Double])]
      .collect().toMap
    assert(math.abs(out(1L)(0) - 0.6) < 1e-12)
    assert(math.abs(out(1L)(1) - 0.8) < 1e-12)
    assert(out(2L).toSeq == Seq(0.0, 0.0))
  }

  test("quantizeInt8: max |x| maps to ±127, roundtrip error < scale/2 + eps") {
    val vec = Array(0.5f, -1.0f, 0.25f, 0.0f)
    val df = Seq((1L, vec)).toDF("id", "vec")
    val row = Embeddings.quantizeInt8(df, "vec").collect().head
    val scale = row.getAs[Double]("q_scale")
    val q = row.getAs[scala.collection.Seq[Int]]("q_vec")
    assert(q.min == -127 && math.abs(scale - 1.0 / 127) < 1e-12)
    vec.zip(q).foreach { case (x, qi) =>
      assert(math.abs(qi * scale - x) <= scale / 2 + 1e-12)
    }
  }

  // ---- Analytics ----------------------------------------------------------

  private def ev(rows: (Long, String, Int)*) =
    rows.map { case (u, t, sec) =>
      (u, t, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), 1.0)
    }.toDF("user_id", "event_type", "ts", "value")

  test("funnel enforces strict event ordering per user") {
    val events = ev(
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3), // full funnel
      (2L, "view", 5), (2L, "click", 4),   // click BEFORE view: stops at view
      (3L, "click", 1), (3L, "purchase", 2)) // never viewed: not counted
    val out = Analytics.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 2L, "click" -> 1L, "purchase" -> 1L))
  }

  test("cohortRetention buckets activity by weeks since first event") {
    val events = Seq(
      (1L, "view", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (1L, "view", java.sql.Timestamp.valueOf("2024-01-09 10:00:00"), 1.0),
      (2L, "view", java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1.0))
      .toDF("user_id", "event_type", "ts", "value")
    val out = Analytics.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01", 0L)) == 1L) // user 1 week 0
    assert(out(("2024-01-01", 1L)) == 1L) // user 1 active 8 days later
    assert(out(("2024-01-02", 0L)) == 1L) // user 2's own cohort
  }

  test("histogram bins cover values, counts sum to non-null rows") {
    val df = Seq(0.5, 1.5, 2.5, 9.9, 10.0).toDF("v")
    val out = Analytics.histogram(df, "v", 5.0)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out == Map(0.0 -> 3L, 5.0 -> 1L, 10.0 -> 1L))
  }

  test("distributionDrift: identical halves → 0, disjoint halves → 1") {
    val same = (1 to 100).map(_.toDouble).toDF("v")
    val zero = Analytics.distributionDrift(same, same, "v", 10.0)
      .select("tv_distance").distinct().collect()
    assert(zero.map(_.getDouble(0)).toSeq == Seq(0.0))
    val lo = (1 to 100).map(_.toDouble).toDF("v")
    val hi = (1001 to 1100).map(_.toDouble).toDF("v")
    val one = Analytics.distributionDrift(lo, hi, "v", 10.0)
    assert(one.select("tv_distance").distinct()
      .collect().map(_.getDouble(0)).toSeq == Seq(1.0))
    // one-sided bins appear with probability 0 on the absent side
    val rows = one.collect()
    assert(rows.exists(r => r.getDouble(1) > 0 && r.getDouble(2) == 0.0))
    assert(rows.exists(r => r.getDouble(1) == 0.0 && r.getDouble(2) > 0))
  }

  test("zscoreOutliers flags the single extreme value") {
    val vals = Seq.fill(30)(10.0) ++ Seq(10.5, 9.5, 1000.0)
    val df = vals.map(("a", _)).toDF("g", "v")
    val out = Analytics.zscoreOutliers(df, "g", "v").collect().head
    assert(out.getLong(1) == 33L && out.getLong(2) == 1L)
  }

  test("rankNormalize matches percent_rank semantics incl. ties") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 7.0), // single-row group -> 0.0
      ("c", 6L, 1.0), ("c", 7L, 2.0)
    ).toDF("src", "id", "score")
    val got = Analytics.rankNormalize(df, "src", "score")
      .select("id", "pct_rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // group a (n=4): ranks 1, 2, 2, 4 -> (rank-1)/3
    assert(got(1L) == 0.0 && got(4L) == 1.0)
    assert(math.abs(got(2L) - 1.0 / 3) < 1e-12 && got(2L) == got(3L))
    assert(got(5L) == 0.0)
    assert(got(6L) == 0.0 && got(7L) == 1.0)
    // cross-check against Spark's own percent_rank window
    import org.apache.spark.sql.expressions.Window
    val ref = df.withColumn("pr", percent_rank().over(
        Window.partitionBy("src").orderBy("score")))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got == ref)
  }

  test("rankNormalize: null scores get null rank, rows preserved") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(9.0)))
      .toDF("src", "id", "score")
    val got = Analytics.rankNormalize(df, "src", "score")
    assert(got.count() == 3)
    val nullRow = got.where(col("id") === 2L).select("pct_rank").head
    assert(nullRow.isNullAt(0))
  }

  test("rankNormalizeApprox staircase brackets the exact rank") {
    val df = (1 to 200).map(i => ("a", i.toLong, i.toDouble))
      .toDF("src", "id", "score")
    val got = Analytics.rankNormalizeApprox(df, "src", "score",
        buckets = 20)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // uniform scores: estimate within one bucket step of the true rank
    (1 to 200).foreach { i =>
      val exact = (i - 1).toDouble / 199
      assert(math.abs(got(i.toLong) - exact) <= 0.1,
        s"id $i: ${got(i.toLong)} vs $exact")
    }
    assert(got(200L) > got(1L))
  }

  test("gateFunnel: cumulative survivor counts in one row, one pass") {
    val df = Seq(
      (1L, "good long doc here ok", "en"),
      (2L, "", "en"),                       // fails nonempty
      (3L, "short one", "en"),              // fails min 4 tokens
      (4L, "vier tokens hier genau", "de"), // fails lang
      (5L, "another fine english doc", "en"))
      .toDF("id", "text", "lang")
    val got = Analytics.gateFunnel(df, Seq(
      "nonempty" -> (length(trim(col("text"))) > 0),
      "min_tokens" -> (TextAnalysis.tokenCount(col("text")) >= 4),
      "is_en" -> (col("lang") === "en"))).collect()(0)
    assert(got.getLong(0) == 5L)  // rows_in
    assert(got.getLong(1) == 4L)  // nonempty
    assert(got.getLong(2) == 3L)  // + >=4 tokens
    assert(got.getLong(3) == 2L)  // + en
    // one aggregation pass: no joins, a single Aggregate pair
    val plan = Analytics.gateFunnel(df,
      Seq("a" -> lit(true), "b" -> lit(false)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan)
    // gates must be uniquely named and may not shadow rows_in
    assertThrows[IllegalArgumentException] {
      Analytics.gateFunnel(df, Seq("x" -> lit(true), "x" -> lit(true)))
    }
    assertThrows[IllegalArgumentException] {
      Analytics.gateFunnel(df, Seq("rows_in" -> lit(true)))
    }
    // empty corpus reports zeros, not nulls
    val empty = Analytics.gateFunnel(df.where(lit(false)),
      Seq("g" -> lit(true))).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }
}
