package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Writer

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: key "hot" has 10k rows, 10 cold keys have 10 each
  private lazy val skewed = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
    (1 to 10).flatMap(k => (1 to 10).map(i => (s"cold$k", i.toDouble))))
    .toDF("k", "v")

  test("saltedAggregate matches plain groupBy on every decomposable op") {
    val got = Skew.saltedAggregate(skewed, Seq("k"), Seq(
      Seq("v", "sum", "s"), Seq("v", "count", "c"), Seq("v", "mean", "m"),
      Seq("v", "min", "lo"), Seq("v", "max", "hi")), buckets = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val exp = skewed.groupBy(col("k")).agg(sum("v"), count("v"), avg("v"),
      min("v"), max("v")).collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (s, c, m, lo, hi)) =>
      val (es, ec, em, elo, ehi) = exp(k)
      assert(math.abs(s - es) < 1e-6 && c == ec &&
        math.abs(m - em) < 1e-9 && lo == elo && hi == ehi, s"key $k")
    }
  }

  test("saltedAggregate spreads the hot key over salt buckets (phase 1)") {
    // internal property: phase-1 grouping key count for the hot key > 1
    val salted = skewed.withColumn("__salt",
      pmod((rand(42) * 8).cast("int"), lit(8)))
    val hotBuckets = salted.where(col("k") === "hot")
      .select(countDistinct(col("__salt"))).collect()(0).getLong(0)
    assert(hotBuckets > 4) // hot rows actually spread
  }

  test("saltedAggregate rejects non-decomposable ops") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAggregate(skewed, Seq("k"),
        Seq(Seq("v", "count_distinct", "d")))
    }
    assert(e.getMessage.contains("count_distinct"))
  }

  test("saltedJoin matches plain join for inner/left/semi/anti") {
    val dim = (0 to 10).map(k => (if (k == 0) "hot" else s"cold$k",
      k * 1.5)).toDF("k", "w")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val got = Skew.saltedJoin(skewed, dim, Seq("k"), buckets = 8,
        joinType = jt)
      val exp = skewed.join(dim, Seq("k"), jt)
      assert(got.collect().toSet == exp.collect().toSet, jt)
    }
  }

  test("saltedJoin rejects join types broken by replication") {
    val dim = Seq(("hot", 1.0)).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), joinType = "full")
    }
    assert(e.getMessage.contains("not preserved"))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS g_fact")
    spark.sql("DROP TABLE IF EXISTS g_dim")
    // a prior JVM's managed-table dirs are unknown to this session's
    // in-memory catalog; clear them or saveAsTable refuses the location
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("g_fact", "g_dim").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val fact = (1 to 5000).map(i => (i.toLong % 100, i.toDouble))
      .toDF("fk", "amount")
    val dim = (0L until 100L).map(k => (k, s"name$k")).toDF("fk", "name")
    Writer.dfToBucketedTable(fact, "g_fact", Seq("fk"), 8)
    Writer.dfToBucketedTable(dim, "g_dim", Seq("fk"), 8)
    val joined = spark.table("g_fact")
      .join(spark.table("g_dim").hint("merge"), "fk")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: no shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    assert(joined.count() == 5000)
  }
}
