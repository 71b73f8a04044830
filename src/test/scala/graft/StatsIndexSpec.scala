package graft

import org.apache.spark.sql.functions._

import graft.sources.StatsIndex
import graft.sources.StatsIndex.Range

/** External file-stats manifest: index shape, conservative pruning
  * (null stats survive), result equivalence with the full read, and
  * the actual file-count reduction the operator exists for. */
class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val dir = tmpDir()
    val df = (1L to 8000L).map(i => (i, i % 97, i.toDouble))
      .toDF("k", "g", "v")
    df.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$dir/data")
    StatsIndex.writeIndex(spark, s"$dir/data", s"$dir/index", Seq("k"))
    dir
  }

  test("index has one row per file with tight range stats") {
    val idx = spark.read.parquet(s"$root/index").collect()
    assert(idx.length == 8)
    assert(idx.map(_.getAs[Long]("n_rows")).sum == 8000L)
    // range-clustered write → file intervals are disjoint
    val spans = idx.map(r =>
      (r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))).sorted
    spans.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo)
      case _ => ()
    }
  }

  test("pruned read ≡ full filtered read, touching fewer files") {
    val preds = Seq(Range("k", 2000L, 3000L))
    val pruned = StatsIndex.prunedFiles(
      spark.read.parquet(s"$root/index"), preds)
    assert(pruned.nonEmpty && pruned.length < 8,
      s"expected a strict subset of 8 files, got ${pruned.length}")
    val got = StatsIndex.prunedRead(spark, s"$root/data", s"$root/index",
        preds).agg(count(lit(1)), sum("v")).collect()(0)
    val want = spark.read.parquet(s"$root/data")
      .where(col("k") >= 2000L && col("k") <= 3000L)
      .agg(count(lit(1)), sum("v")).collect()(0)
    assert(got == want)
  }

  test("a range beyond the data reads nothing but keeps the schema") {
    val out = StatsIndex.prunedRead(spark, s"$root/data", s"$root/index",
      Seq(Range("k", 100000L, 200000L)))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "g", "v"))
  }

  test("null stats survive pruning (all-null column must scan)") {
    val dir = tmpDir()
    val df = Seq((1L, null: java.lang.Long), (2L, null: java.lang.Long))
      .toDF("k", "n")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    StatsIndex.writeIndex(spark, s"$dir/data", s"$dir/index", Seq("n"))
    val files = StatsIndex.prunedFiles(
      spark.read.parquet(s"$dir/index"), Seq(Range("n", 5L, 9L)))
    assert(files.length == 1) // nothing provable — must survive
  }

  test("bloom point pruning: only sketch-positive files survive") {
    val dir = tmpDir()
    // two files with DISJOINT key sets but overlapping [min,max]
    // intervals (interleaved parity), so interval pruning is useless
    // and only the sketch can discriminate
    val even = (0L until 2000L by 2).map(i => (i, i.toDouble))
      .toDF("k", "v")
    val odd = (1L until 2000L by 2).map(i => (i, i.toDouble))
      .toDF("k", "v")
    even.coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    odd.coalesce(1).write.mode("append").parquet(s"$dir/data")
    StatsIndex.writeIndex(spark, s"$dir/data", s"$dir/index", Seq("k"),
      bloomCols = Seq("k"))
    // interval-only: both files survive (ranges overlap)
    val byRange = StatsIndex.prunedFiles(
      spark.read.parquet(s"$dir/index"),
      Seq(Range("k", 500L, 500L)))
    assert(byRange.length == 2)
    // sketch: the odd file cannot contain an even key
    val byPoint = StatsIndex.prunedFiles(
      spark.read.parquet(s"$dir/index"), Nil,
      Seq(StatsIndex.Point("k", 500L)))
    assert(byPoint.length == 1)
    val got = StatsIndex.prunedRead(spark, s"$dir/data", s"$dir/index",
        Nil, Seq(StatsIndex.Point("k", 500L)))
      .select("k", "v").as[(Long, Double)].collect().toSeq
    assert(got == Seq((500L, 500.0)))
  }

  test("updateIndex indexes only new files, history untouched") {
    val dir = tmpDir()
    (1L to 1000L).map(i => (i, i.toDouble)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    val idx0 = StatsIndex.buildIndex(spark, s"$dir/data", Seq("k"))
      .localCheckpoint(true)
    assert(idx0.count() == 1)
    // no new files → the SAME frame back, no scan
    assert(StatsIndex.updateIndex(spark, s"$dir/data", idx0,
      Seq("k")) eq idx0)
    // append a drop; only it gets indexed
    (2001L to 3000L).map(i => (i, i.toDouble)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(s"$dir/data")
    val idx1 = StatsIndex.updateIndex(spark, s"$dir/data", idx0,
      Seq("k"))
    val rows = idx1.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 2000L)
    // the union prunes like a fresh build: the gap matches nothing
    assert(StatsIndex.prunedFiles(idx1,
      Seq(Range("k", 1500L, 1800L))).isEmpty)
    assert(StatsIndex.prunedFiles(idx1,
      Seq(Range("k", 2500L, 2600L))).length == 1)
  }

  test("point probe with a mis-typed literal fails loudly") {
    val dir = tmpDir()
    (1L to 100L).map(i => (i, i.toDouble)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    StatsIndex.writeIndex(spark, s"$dir/data", s"$dir/index", Seq("k"),
      bloomCols = Seq("k"))
    val e = intercept[IllegalArgumentException] {
      StatsIndex.prunedFiles(spark.read.parquet(s"$dir/index"), Nil,
        Seq(StatsIndex.Point("k", 50))) // Int vs indexed bigint
    }
    assert(e.getMessage.contains("indexed as bigint"))
  }

  test("nested (partitioned) layouts are rejected at build time") {
    val dir = tmpDir()
    (1L to 100L).map(i => (i, i % 3)).toDF("k", "p")
      .write.partitionBy("p").mode("overwrite").parquet(s"$dir/data")
    val e = intercept[IllegalArgumentException] {
      StatsIndex.buildIndex(spark, s"$dir/data", Seq("k"))
    }
    assert(e.getMessage.contains("flat directory"))
  }

  test("multi-range conjunction prunes on every indexed column") {
    val dir = tmpDir()
    val df = (1L to 4000L).map(i => (i, 4000L - i)).toDF("a", "b")
    df.repartitionByRange(4, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/data")
    StatsIndex.writeIndex(spark, s"$dir/data", s"$dir/index",
      Seq("a", "b"))
    // a ∈ [1, 500] pins the low-a file; b ∈ [1, 500] pins the HIGH-a
    // file (b runs opposite) — the conjunction matches no file
    val files = StatsIndex.prunedFiles(
      spark.read.parquet(s"$dir/index"),
      Seq(Range("a", 1L, 500L), Range("b", 1L, 500L)))
    assert(files.isEmpty)
  }
}
