package graft

import graft.sources.Transport

/** Top-level so Spark can derive an Encoder (inner classes cannot). */
case class TransportRow(i: Long, d: Double, s: String, b: Boolean)

class TransportSpec extends SparkSpec {
  import spark.implicits._

  private type T = TransportRow
  private val T = TransportRow

  test("arrow IPC bytes round-trip preserves schema and values") {
    val df = Seq(T(1L, 1.5, "x", true), T(2L, -2.25, "héllo", false)).toDF()
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.schema == df.schema)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("round-trip preserves nulls") {
    val df = Seq((Some(1L), Option.empty[Double], Some("a")),
      (None, Some(2.5), None))
      .toDF("i", "d", "s")
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("base64 round-trip (transport.py:47-75 parity)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s = Transport.serializeArrowBase64(df)
    assert(s.matches("[A-Za-z0-9+/=]+")) // text-protocol safe
    val back = Transport.deserializeArrowBase64(spark, s)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("aggregation result round-trips (the reference's actual use)") {
    val df = AggregateEngine.aggregatePq(spark,
      "/root/testdata/sf0.001/lineitem.parquet",
      Seq("l_returnflag"), Seq(Seq("l_quantity", "sum", "s")))
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("date and timestamp columns round-trip") {
    val df = Seq(
      (java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")),
      (java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999999")))
      .toDF("d", "ts")
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.schema == df.schema)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("embedding (array<float>) result round-trips — generic-table parity") {
    // the reference transport ships ANY pa.Table (transport.py:12-39);
    // list columns (the embeddings shape) must survive the IPC edge
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").limit(8)
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.schema == df.schema)
    val exp = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got == exp)
  }

  test("array<double>, null arrays, and decimal columns round-trip") {
    val df = Seq(
      (1L, Option(Seq(1.0, -2.5, 0.125)), BigDecimal("12.34")),
      (2L, Option.empty[Seq[Double]], BigDecimal("-0.07")))
      .toDF("k", "v", "d")
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.schema == df.schema)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("empty result round-trips") {
    val df = Seq((1L, "a")).toDF("k", "v").where("k > 5")
    val back = Transport.deserializeArrowBytes(spark,
      Transport.serializeArrowBytes(df))
    assert(back.count() == 0)
    assert(back.schema == df.schema)
  }
}
