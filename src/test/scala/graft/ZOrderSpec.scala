package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits: hand-computed Morton codes, nulls to bucket 0") {
    // x=0b11, y=0b01, 2 bits: out bit j*2+i → x0@0, y0@1, x1@2, y1@3
    // = 1 + 2 + 4 + 0 = 7; (0,0) → 0; (3,3) → 15
    val got = Seq(
      (Some(3L), Some(1L)), (Some(0L), Some(0L)), (Some(3L), Some(3L)),
      (None, Some(3L))
    ).toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 2).as("k"))
      .as[Long].collect().toSeq
    assert(got == Seq(7L, 0L, 15L, 10L)) // null x → only y bits @1,3
  }

  test("withZKey: min/max map to first/last bucket, degenerate and " +
      "null-heavy columns land in bucket 0") {
    val df = Seq((0.0, 5.0), (100.0, 5.0), (50.0, 5.0))
      .toDF("a", "b") // b is degenerate (min == max)
    val keyed = ZOrder.withZKey(df, Seq("a", "b"), bits = 4)
    val keys = keyed.orderBy("a").select("__zkey").as[Long].collect()
    // b contributes nothing; a=0 → bucket 0, a=100 → bucket 15,
    // interleaved alone at positions 0,2,4,6 → 0b01010101 = 85
    assert(keys(0) == 0L)
    assert(keys(2) == (0 until 4).map(j => 1L << (2 * j)).sum)
    assert(keys(1) > 0L && keys(1) < keys(2)) // mid value, monotone
  }

  test("z-ordered layout prunes row groups in BOTH dimensions; " +
      "unclustered layout reads everything") {
    val n = 40000
    // two independent uniform dimensions (hash-decorrelated)
    val df = spark.range(n).select(
      (col("id") % 200).as("a"),
      (xxhash64(col("id")) % 200 + 200).cast("long").as("b"),
      col("id").as("payload"))
    val zDir = tmpDir() + "/z"
    val rDir = tmpDir() + "/r"
    ZOrder.writeZOrdered(df, zDir, Seq("a", "b"), bits = 8,
      numFiles = 16)
    graft.sources.Writer.dfToParquet(df.repartition(16), rDir)

    def scannedRows(dir: String): Long = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // ~10% rectangle per dimension → ~1% of the area
        val q = spark.read.parquet(dir)
          .where(col("a").between(0, 19) && col("b").between(0, 19))
          .agg(count(lit(1)))
        q.collect()
        val scans = q.queryExecution.executedPlan.collectLeaves()
          .filter(_.nodeName.toLowerCase.contains("scan"))
        assert(scans.nonEmpty, "no scan node found")
        scans.map(_.metrics("numOutputRows").value).sum
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }

    val zRows = scannedRows(zDir)
    val rRows = scannedRows(rDir)
    // the unclustered layout's row-group stats span both domains →
    // nothing prunes; the Morton layout keeps both dimensions' ranges
    // tight per row group → the rectangle touches a small fraction
    assert(rRows == n, s"expected full scan on random layout, got $rRows")
    assert(zRows <= n / 4,
      s"z-order should prune most row groups: read $zRows of $n")
    // and both layouts agree on the answer, of course
    val za = spark.read.parquet(zDir)
      .where(col("a").between(0, 19) && col("b").between(0, 19)).count()
    val ra = spark.read.parquet(rDir)
      .where(col("a").between(0, 19) && col("b").between(0, 19)).count()
    assert(za == ra)
  }

  test("writeZOrdered round-trips every row and column (no key leak)") {
    val df = Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "z"))
      .toDF("a", "b", "s")
    val dir = tmpDir() + "/zr"
    ZOrder.writeZOrdered(df, dir, Seq("a", "b"), bits = 4)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == Seq("a", "b", "s"))
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2))).toSet ==
      Set((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "z")))
  }

  test("quantile bucketization spreads a Zipfian column evenly where " +
      "linear collapses it") {
    // exponentially distributed values (1, 2, 4, ... 2^19, each 5% of
    // rows): under min/max scaling everything below max/64 — 70% of
    // the mass — collapses into bucket 0, and only ~7 buckets are
    // used at all; rank cut points give each value its own bucket
    val n = 20000
    val df = spark.range(n).select(
      pow(lit(2.0), (col("id") % 20).cast("double")).cast("long").as("a"),
      col("id").as("payload"))
    def spread(mode: String): (Long, Long) = {
      val keyed = ZOrder.withZKey(df, Seq("a"), bits = 6,
        bucketize = mode)
      val occ = keyed.groupBy(col("__zkey")).count()
        .agg(count(lit(1)), max(col("count"))).collect()(0)
      (occ.getLong(0), occ.getLong(1))
    }
    val (linBuckets, linMax) = spread("linear")
    val (qBuckets, qMax) = spread("quantile")
    assert(linBuckets <= 8,
      s"linear on exponential data uses few buckets: $linBuckets")
    assert(linMax >= (n * 6L) / 10,
      s"linear should pile most rows into one bucket: $linMax")
    assert(qBuckets >= 16,
      s"quantile mode should use ~one bucket per value: $qBuckets")
    assert(qMax <= n / 10,
      s"no quantile bucket should exceed one value's mass: $qMax")
  }

  test("quantile mode: bucket ids are rank-monotone and null-safe") {
    val df = Seq[Option[Long]](Some(5L), Some(1L), None, Some(9L),
      Some(7L), Some(3L)).toDF("a")
    val keyed = ZOrder.withZKey(df, Seq("a"), bits = 2,
      bucketize = "quantile")
      .select(col("a"), col("__zkey")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1)))
    val nonNull = keyed.collect { case (Some(v), k) => (v, k) }.sortBy(_._1)
    assert(nonNull.map(_._2).toSeq == nonNull.map(_._2).sorted.toSeq,
      s"bucket ids must be monotone in value: ${nonNull.toSeq}")
    assert(nonNull.map(_._2).distinct.length > 1, "buckets must split")
    assert(keyed.collect { case (None, k) => k }.forall(_ == 0L),
      "nulls land in bucket 0")
  }

  test("quantile round-trip equals linear round-trip content") {
    val df = Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "z"))
      .toDF("a", "b", "s")
    val dir = tmpDir() + "/zq"
    ZOrder.writeZOrdered(df, dir, Seq("a", "b"), bits = 4,
      bucketize = "quantile")
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == Seq("a", "b", "s"))
    assert(back.count() == 3)
  }
}
